"""Analysis filter pack goldens.

Expected outputs follow the reference's own documented examples:
WordDelimiterFilter Javadoc :35-73 and TestWordDelimiterFilter doSplit
cases; ShingleFilter/SynonymFilter/EdgeNGram semantics per their class
docs.  Positions are absolute (pos holes = increments > 1).
"""

import pytest

from lucene_solr_old_spark.functions.filters import (
    SynonymMap, ascii_fold, edge_ngrams, fold_text, shingle, synonym_filter,
    word_delimiter)
from lucene_solr_old_spark.functions.tokenizer import Token


def toks(*terms_at):
    """[(term, pos)] -> Token list with synthetic offsets."""
    out = []
    off = 0
    for term, pos in terms_at:
        out.append(Token(term, pos, off, off + len(term)))
        off += len(term) + 1
    return out


def tp(tokens):
    return [(t.term, t.pos) for t in tokens]


class TestAsciiFolding:
    def test_accents(self):
        assert fold_text("café résumé naïve") == "cafe resume naive"

    def test_specials(self):
        # the non-NFKD cases ASCIIFoldingFilter enumerates
        assert fold_text("Æther straße Łódź œuvre") == \
            "AEther strasse Lodz oeuvre"

    def test_punctuation_folds(self):
        assert fold_text("“quoted” – it’s") == '"quoted" - it\'s'

    def test_non_latin_passthrough(self):
        assert fold_text("Роберт 中文") == "Роберт 中文"

    def test_token_filter(self):
        out = ascii_fold(toks(("café", 0), ("bar", 1)))
        assert tp(out) == [("cafe", 0), ("bar", 1)]


class TestWordDelimiter:
    # TestWordDelimiterFilter.doSplit goldens (flags: generate parts,
    # split on case change + numerics, stem possessive)
    @pytest.mark.parametrize("inp,expected", [
        ("basic-split", ["basic", "split"]),
        ("camelCase", ["camel", "Case"]),
        ("PowerShot", ["Power", "Shot"]),
        ("SD500", ["SD", "500"]),
        ("//hello---there, 'dude'", ["hello", "there", "dude"]),
        ("test's'", ["test"]),
        ("Роберт", ["Роберт"]),
        ("РобЕрт", ["Роб", "Ерт"]),
        ("ســلام", ["ســلام"]),
        ("हिन्दी", ["हिन्दी"]),
        ("١٢٣٤", ["١٢٣٤"]),
        ("XMLParser", ["XML", "Parser"]),
    ])
    def test_dosplit(self, inp, expected):
        out = word_delimiter(toks((inp, 0)))
        assert [t.term for t in out] == expected

    def test_possessive_off(self):
        # doSplitPossessive(0, "ra's", "ra", "s")
        out = word_delimiter(toks(("ra's", 0)), stem_english_possessive=False)
        assert [t.term for t in out] == ["ra", "s"]

    def test_catenate_all_positions(self):
        # Javadoc: "PowerShot" -> 0:"Power", 1:"Shot", 1:"PowerShot"
        out = word_delimiter(toks(("PowerShot", 0)), catenate_all=True)
        assert tp(out) == [("Power", 0), ("Shot", 1), ("PowerShot", 1)]

    def test_catenate_runs_break_at_numbers(self):
        # Javadoc: Super-Duper-XL500-42-AutoCoder! ->
        # 0:Super 1:Duper 2:XL 2:SuperDuperXL 3:500 4:42 5:Auto 6:Coder
        # 6:AutoCoder   (catenate_words only)
        out = word_delimiter(toks(("Super-Duper-XL500-42-AutoCoder!", 0)),
                             catenate_words=True)
        assert tp(out) == [
            ("Super", 0), ("Duper", 1), ("XL", 2), ("SuperDuperXL", 2),
            ("500", 3), ("42", 4), ("Auto", 5), ("Coder", 6),
            ("AutoCoder", 6)]

    def test_catenate_possessive_runs(self):
        # Javadoc: "A's+B's&C's" -> 0:A, 1:B, 2:C, 2:ABC
        out = word_delimiter(toks(("A's+B's&C's", 0)), catenate_words=True)
        assert tp(out) == [("A", 0), ("B", 1), ("C", 2), ("ABC", 2)]

    def test_preserve_original_stacks(self):
        out = word_delimiter(toks(("wi-fi", 0)), preserve_original=True)
        assert tp(out) == [("wi-fi", 0), ("wi", 0), ("fi", 1)]

    def test_passthrough_token(self):
        out = word_delimiter(toks(("plain", 0), ("words", 1)))
        assert tp(out) == [("plain", 0), ("words", 1)]


class TestShingle:
    def test_bigrams_with_unigrams(self):
        out = shingle(toks(("please", 0), ("divide", 1), ("this", 2)))
        assert tp(out) == [
            ("please", 0), ("please divide", 0),
            ("divide", 1), ("divide this", 1),
            ("this", 2)]

    def test_trigram_range(self):
        out = shingle(toks(("a", 0), ("b", 1), ("c", 2)),
                      min_shingle=2, max_shingle=3, output_unigrams=False)
        assert tp(out) == [("a b", 0), ("a b c", 0), ("b c", 1)]

    def test_filler_for_stopword_hole(self):
        # positions 0 and 2 (hole at 1, like a removed stopword)
        out = shingle(toks(("please", 0), ("divide", 2)),
                      output_unigrams=False)
        # shingle across the hole uses the filler; no shingle ENDS in filler
        assert tp(out) == [("please _", 0), ("_ divide", 1)]


class TestSynonyms:
    def test_single_word_stacks(self):
        smap = SynonymMap().add("fast", "quick")
        out = synonym_filter(toks(("a", 0), ("fast", 1), ("car", 2)), smap)
        assert tp(out) == [("a", 0), ("fast", 1), ("quick", 1), ("car", 2)]

    def test_multiword_match_single_output(self):
        smap = SynonymMap().add("new york", "nyc")
        out = synonym_filter(toks(("new", 0), ("york", 1), ("pizza", 2)),
                             smap)
        assert tp(out) == [("new", 0), ("nyc", 0), ("york", 1), ("pizza", 2)]

    def test_single_match_multiword_output(self):
        smap = SynonymMap().add("nyc", "new york city")
        out = synonym_filter(toks(("visit", 0), ("nyc", 1)), smap)
        assert tp(out) == [("visit", 0), ("nyc", 1), ("new", 1),
                           ("york", 2), ("city", 3)]

    def test_longest_match_wins(self):
        smap = (SynonymMap().add("big", "large")
                .add("big apple", "nyc"))
        out = synonym_filter(toks(("big", 0), ("apple", 1)), smap)
        assert tp(out) == [("big", 0), ("nyc", 0), ("apple", 1)]

    def test_replace_mode(self):
        smap = SynonymMap().add("fast", "quick")
        out = synonym_filter(toks(("fast", 0)), smap, keep_orig=False)
        assert tp(out) == [("quick", 0)]

    def test_hole_breaks_multiword_match(self):
        smap = SynonymMap().add("new york", "nyc")
        # stopword hole between new(0) and york(2): no match
        out = synonym_filter(toks(("new", 0), ("york", 2)), smap)
        assert tp(out) == [("new", 0), ("york", 2)]

    def test_equivalents(self):
        smap = SynonymMap().add_equivalents("tv", "television")
        out = synonym_filter(toks(("tv", 0)), smap)
        assert tp(out) == [("tv", 0), ("television", 0)]


class TestEdgeNGrams:
    def test_front_grams_stacked(self):
        out = edge_ngrams(toks(("spark", 0)), min_gram=2, max_gram=4)
        assert tp(out) == [("sp", 0), ("spa", 0), ("spar", 0)]

    def test_short_tokens(self):
        out = edge_ngrams(toks(("ab", 0)), min_gram=3, max_gram=5)
        assert out == []


class TestFiltersEndToEnd:
    """Distributed build with custom filter chains (register_analyzer
    closures cloudpickled to executors)."""

    def test_multiword_synonym_phrase_match(self, spark):
        from lucene_solr_old_spark.functions.filters import (
            SynonymMap, synonym_filter)
        from lucene_solr_old_spark.functions.tokenizer import (
            register_analyzer, ws_stop_analyze)
        from lucene_solr_old_spark.operators.indexer import build_index
        from lucene_solr_old_spark.operators.search import search_phrase

        smap = SynonymMap().add("dns", "domain name service")
        register_analyzer(
            "ws_syn_test",
            lambda text: synonym_filter(ws_stop_analyze(text), smap))
        df = spark.createDataFrame(
            [("d1", "configure dns today"),
             ("d2", "domain name service rocks"),
             ("d3", "nothing relevant")],
            "url STRING, text STRING")
        idx = build_index(df, num_segments=2, analyzer="ws_syn_test")
        # phrase "domain name service" matches the doc that only said "dns"
        got = {r["key"] for r in
               search_phrase(idx, "domain name service", k=10).collect()}
        assert got == {"d1", "d2"}

    def test_english_folded_chain(self, spark):
        from lucene_solr_old_spark.operators.indexer import build_index
        from lucene_solr_old_spark.operators.search import search_or

        df = spark.createDataFrame(
            [("d1", "the café RÉSUMÉ"), ("d2", "cafe resume"),
             ("d3", "unrelated words")],
            "url STRING, text STRING")
        idx = build_index(df, num_segments=2, analyzer="english_folded")
        got = {r["key"] for r in search_or(idx, "café", k=10).collect()}
        assert got == {"d1", "d2"}


class TestKeywordAndCommonGrams:
    def test_keyword_marker_protects_from_stemming(self):
        from lucene_solr_old_spark.functions.filters import (
            keyword_marked_stem)

        inp = toks(("running", 0), ("maine", 1))
        out = keyword_marked_stem(inp, protected={"maine"})
        assert [t.term for t in out] == ["run", "maine"]

    def test_common_grams_index_mode(self):
        from lucene_solr_old_spark.functions.filters import common_grams

        inp = toks(("the", 0), ("quick", 1), ("fox", 2))
        out = common_grams(inp, common_words={"the"})
        assert [(t.term, t.pos) for t in out] == [
            ("the", 0), ("the_quick", 0), ("quick", 1), ("fox", 2)]

    def test_common_grams_query_mode(self):
        from lucene_solr_old_spark.functions.filters import common_grams

        inp = toks(("the", 0), ("quick", 1), ("fox", 2))
        out = common_grams(inp, common_words={"the"}, query_mode=True)
        assert [(t.term, t.pos) for t in out] == [
            ("the_quick", 0), ("fox", 2)]
