"""Japanese analysis — kuromoji analogue (dictionary Viterbi lattice).

Re-derivation of the reference's kuromoji module
(``lucene/analysis/kuromoji/src/java/org/apache/lucene/analysis/ja/``):

  * JapaneseTokenizer — Viterbi over a word lattice of dictionary
    entries + unknown-word runs (maximal same-script chunks), with
    Mode.SEARCH's long-token penalty (kanji length > 3, other length
    > 7 — ``JapaneseTokenizer.java`` SEARCH_MODE_* constants) so
    compounds decompose, and the decomposed-compound re-emission:
    a dictionary compound or an unknown katakana run that the chosen
    path tiles with >= 2 parts is ALSO emitted after its first part
    with positionIncrement 0 and positionLength = #parts
    (``TestJapaneseAnalyzer.testDecomposition`` fixtures);
  * JapaneseBaseFormFilter — replace inflected forms with the
    dictionary base form (落ち -> 落ちる);
  * JapanesePartOfSpeechStopFilter — drop tokens whose POS is in the
    stop-tag set (default: particles 助詞, auxiliary verbs 助動詞,
    symbols 記号 — the heart of the reference's stoptags.txt);
  * CJKWidthFilter (full/half width fold), StopFilter(ja),
    JapaneseKatakanaStemFilter (katakana longer than 4 chars lose a
    trailing prolonged-sound mark ー), LowerCaseFilter — chained in
    ``JapaneseAnalyzer.createComponents`` order.

The reference's MeCab-IPADIC binary dictionaries are DATA and are not
copied — pluggable ``dict_entries`` with a compact original default
covering the reference's own test sentences (the same stance as the
smartcn / Thai / KStem lexicons: algorithm exact, data replaceable).
"""

from __future__ import annotations

from .tokenizer import Token

__all__ = ["JA_STOP_TAGS", "JA_STOP_WORDS", "DEFAULT_JA_DICT",
           "JaToken", "japanese_tokenize", "japanese_analyze",
           "make_japanese_analyzer", "katakana_stem",
           "iteration_mark_normalize"]

JA_STOP_TAGS = frozenset(["助詞", "助動詞", "記号"])

# compact subset of the reference ja/stopwords.txt head
JA_STOP_WORDS = frozenset("""
の に は を た が で て と し れ さ ある いる も する から な こと として
い や れる など なっ ない この ため その あっ よう また もの という あり
まで られ なる へ か だ これ によって により おり より による ず なり
られる において
""".split())

# surface -> (cost, pos, base_form); compounds listed in DEFAULT_JA_COMPOUNDS
DEFAULT_JA_DICT: dict[str, tuple[int, str, str | None]] = {
    "多く": (2000, "名詞", None), "の": (1000, "助詞", None),
    "学生": (2000, "名詞", None), "が": (1000, "助詞", None),
    "試験": (2000, "名詞", None), "に": (1000, "助詞", None),
    "落ち": (2000, "動詞", "落ちる"), "た": (1000, "助動詞", None),
    "。": (500, "記号", None), "、": (500, "記号", None),
    "シニア": (2000, "名詞", None), "ソフトウェア": (2000, "名詞", None),
    "エンジニア": (2000, "名詞", None), "プロジェクト": (2000, "名詞", None),
    "マネージャー": (2000, "名詞", None),
    "関西": (2000, "名詞", None), "国際": (2000, "名詞", None),
    "空港": (2000, "名詞", None), "成田": (2000, "名詞", None),
    "コニカ": (2000, "名詞", None), "ミノルタ": (2000, "名詞", None),
    "ホールディングス": (2000, "名詞", None),
    "京都大": (2000, "名詞", None), "学": (2000, "名詞", None),
    "硬式": (2000, "名詞", None), "野球": (2000, "名詞", None),
    "部": (2000, "名詞", None),
    "日本": (2000, "名詞", None), "東京": (2000, "名詞", None),
    "食べ": (2000, "動詞", "食べる"), "寿司": (2000, "名詞", None),
}
# dictionary compounds (IPADIC has these as single entries; SEARCH mode
# decomposes them and re-emits the whole)
DEFAULT_JA_COMPOUNDS = frozenset(["関西国際空港", "成田空港"])

_SEARCH_KANJI_LEN = 3   # kanji candidates longer than this are penalized
_SEARCH_OTHER_LEN = 7
_PENALTY = 3000


def _script(ch: str) -> str:
    o = ord(ch)
    if 0x30A0 <= o <= 0x30FF or 0x31F0 <= o <= 0x31FF:
        return "katakana"
    if 0x3040 <= o <= 0x309F:
        return "hiragana"
    if 0x4E00 <= o <= 0x9FFF or 0x3400 <= o <= 0x4DBF:
        return "kanji"
    if ch.isascii() and (ch.isalnum() or ch in "'-._@"):
        return "latin"
    if ch.isspace():
        return "space"
    return "other"


class JaToken:
    __slots__ = ("term", "pos", "start", "end", "pos_inc", "pos_len",
                 "part_of_speech", "base_form")

    def __init__(self, term, start, end, part_of_speech="名詞",
                 base_form=None, pos_inc=1, pos_len=1):
        self.term, self.start, self.end = term, start, end
        self.part_of_speech, self.base_form = part_of_speech, base_form
        self.pos_inc, self.pos_len = pos_inc, pos_len
        self.pos = -1

    def __repr__(self):
        return (f"JaToken({self.term!r}, {self.start}-{self.end}, "
                f"{self.part_of_speech}, +{self.pos_inc}/{self.pos_len})")


def japanese_tokenize(text: str, mode: str = "search",
                      dict_entries: dict | None = None,
                      compounds: frozenset | None = None
                      ) -> list[JaToken]:
    """JapaneseTokenizer: Viterbi segmentation; mode "search" adds the
    long-token penalty + compound re-emission, "normal" keeps compounds
    whole."""
    d = DEFAULT_JA_DICT if dict_entries is None else dict_entries
    comp = DEFAULT_JA_COMPOUNDS if compounds is None else compounds
    max_word = max((len(w) for w in d), default=1)
    n = len(text)
    search = mode == "search"

    def penalty(surface: str) -> int:
        if not search:
            return 0
        sc = _script(surface[0]) if surface else "other"
        ln = len(surface)
        if sc == "kanji" and ln > _SEARCH_KANJI_LEN:
            return (ln - _SEARCH_KANJI_LEN) * _PENALTY
        if sc != "kanji" and ln > _SEARCH_OTHER_LEN:
            return (ln - _SEARCH_OTHER_LEN) * _PENALTY
        return 0

    # Viterbi: best[i] = min cost to reach position i
    INF = float("inf")
    best = [0.0] + [INF] * n
    back: list[tuple[int, str, str, str | None] | None] = [None] * (n + 1)
    i = 0
    while i < n:
        if best[i] is INF:
            i += 1
            continue
        ch = text[i]
        sc = _script(ch)
        if sc == "space":
            if best[i] < best[i + 1]:
                best[i + 1] = best[i]
                back[i + 1] = (i, "", "", None)  # skip marker
            i += 1
            continue
        any_cand = False
        # dictionary candidates (+ compound entries)
        for ln in range(1, min(max_word, n - i) + 1):
            cand = text[i:i + ln]
            if cand in d:
                cost, pos_tag, base = d[cand]
                c = best[i] + cost + penalty(cand)
                if c < best[i + ln]:
                    best[i + ln] = c
                    back[i + ln] = (i, cand, pos_tag, base)
                any_cand = True
            elif cand in comp:
                c = best[i] + 2000 + penalty(cand)
                if c < best[i + ln]:
                    best[i + ln] = c
                    back[i + ln] = (i, cand, "名詞", None)
                any_cand = True
        # unknown run: maximal same-script chunk
        j = i + 1
        while j < n and _script(text[j]) == sc:
            j += 1
        run = text[i:j]
        c = best[i] + 4000 + 1200 * len(run) + penalty(run)
        if c < best[j]:
            best[j] = c
            back[j] = (i, run, "名詞", None)
        # single-char fallback keeps the lattice connected
        if not any_cand and j > i + 1:
            c = best[i] + 6000
            if c < best[i + 1]:
                best[i + 1] = c
                back[i + 1] = (i, ch, "名詞", None)
        i += 1

    # backtrace
    toks: list[JaToken] = []
    p = n
    while p > 0:
        frm, surface, pos_tag, base = back[p]
        if surface:
            toks.append(JaToken(surface, frm, p, pos_tag, base))
        p = frm
    toks.reverse()

    if not search:
        return toks

    # compound re-emission: a dictionary compound or an unknown
    # katakana run tiled by >= 2 chosen tokens is re-emitted after its
    # first part with posInc 0 and posLength = #parts
    out: list[JaToken] = []
    k = 0
    while k < len(toks):
        t = toks[k]
        span_end, parts = t.end, 1
        compound_surface = None
        # longest tiling starting at this token
        m = k + 1
        while m < len(toks) and toks[m].start == span_end:
            span_end = toks[m].end
            surface = text[t.start:span_end]
            if surface in comp or (
                    _script(surface[0]) == "katakana"
                    and all(_script(c) == "katakana" for c in surface)
                    and m - k + 1 >= 2 and span_end - t.start >= 2
                    and _is_unbroken_run(text, t.start, span_end)):
                compound_surface = surface
                parts = m - k + 1
            m += 1
        out.append(t)
        if compound_surface is not None and parts >= 2:
            out.append(JaToken(compound_surface, t.start,
                               t.start + len(compound_surface),
                               "名詞", None, pos_inc=0, pos_len=parts))
        k += 1
    return out


def _is_unbroken_run(text: str, start: int, end: int) -> bool:
    """True when [start, end) is exactly a maximal same-script run."""
    sc = _script(text[start])
    if start > 0 and _script(text[start - 1]) == sc:
        return False
    if end < len(text) and _script(text[end]) == sc:
        return False
    return all(_script(c) == sc for c in text[start:end])


def katakana_stem(term: str, minimum_length: int = 4) -> str:
    """JapaneseKatakanaStemFilter.stem:73-84 — katakana terms of at
    least ``minimum_length`` chars lose a trailing ー (コーヒー ->
    コーヒ but コピー stays; halfwidth ﾀｸｼｰ untouched)."""
    if (len(term) >= minimum_length and term.endswith("ー")
            and all(_script(c) == "katakana" for c in term)):
        return term[:-1]
    return term


_WIDTH_FOLD = {chr(o): chr(o - 0xFEE0) for o in range(0xFF01, 0xFF5F)}


def japanese_analyze(text: str,
                     dict_entries: dict | None = None,
                     compounds: frozenset | None = None,
                     stop_tags: frozenset = JA_STOP_TAGS,
                     stop_words: frozenset = JA_STOP_WORDS,
                     mode: str = "search") -> list[Token]:
    """JapaneseAnalyzer chain: tokenizer -> base form -> POS stop ->
    width fold -> stop(ja) -> katakana stem -> lower, with position
    holes at removed tokens (compound tokens keep posInc 0)."""
    out: list[Token] = []
    pos = -1
    for t in japanese_tokenize(text, mode, dict_entries, compounds):
        pos += t.pos_inc
        term = t.base_form if t.base_form is not None else t.term
        if t.part_of_speech in stop_tags:
            continue
        term = "".join(_WIDTH_FOLD.get(c, c) for c in term)
        if term in stop_words:
            continue
        term = katakana_stem(term).lower()
        out.append(Token(term, pos, t.start, t.end))
    return out


def make_japanese_analyzer(dict_entries: dict | None = None,
                           compounds: frozenset | None = None,
                           mode: str = "search"):
    def _chain(text: str) -> list[Token]:
        return japanese_analyze(text, dict_entries, compounds, mode=mode)
    return _chain


def _register():
    from .tokenizer import register_analyzer

    register_analyzer("japanese", japanese_analyze)


_register()


# ---------------------------------------------------------------------------
# JapaneseIterationMarkCharFilter
# ---------------------------------------------------------------------------

_H_BASE = "かきくけこさしすせそたちつてとはひふへほ"
_H_VOICED = {c: chr(ord(c) + 1) for c in _H_BASE}
_H_VOICED.update({chr(ord(c) + 1): chr(ord(c) + 1) for c in _H_BASE})
_H_DAKUTEN = frozenset(chr(ord(c) + 1) for c in _H_BASE)
_K_VOICED = {chr(ord(k) + 0x60): chr(ord(v) + 0x60)
             for k, v in _H_VOICED.items()}
_K_DAKUTEN = frozenset(chr(ord(c) + 0x60) for c in _H_DAKUTEN)

_KANJI_MARK = "々"            # 々
_H_MARKS = "ゝゞ"         # ゝ ゞ
_K_MARKS = "ヽヾ"         # ヽ ヾ
_FULL_STOP = "。"             # 。


def iteration_mark_normalize(text: str, normalize_kanji: bool = True,
                             normalize_kana: bool = True) -> str:
    """JapaneseIterationMarkCharFilter (ja/JapaneseIterationMarkCharFilter
    .java:233-320): a run of N iteration marks repeats the N characters
    before the run, each mark voicing (ゞ/ヾ) or devoicing (ゝ/ヽ) its
    source; 々 copies a kanji verbatim.  Span rules are exact: runs are
    clipped so the source never crosses a previous span or the stream
    start, a span starting where the previous ended is illegal (marks
    emitted as-is, end position advanced), and 。 closes spans.  Source
    characters always come from the ORIGINAL text."""
    def is_mark(c: str) -> bool:
        if normalize_kanji and c == _KANJI_MARK:
            return True
        return normalize_kana and (c in _H_MARKS or c in _K_MARKS)

    def norm(src: str, mark: str) -> str:
        if mark == "ゝ":    # ゝ devoice
            return chr(ord(src) - 1) if src in _H_DAKUTEN else src
        if mark == "ゞ":    # ゞ voice
            return _H_VOICED.get(src, src)
        if mark == "ヽ":    # ヽ
            return chr(ord(src) - 1) if src in _K_DAKUTEN else src
        if mark == "ヾ":    # ヾ
            return _K_VOICED.get(src, src)
        return src              # 々 kanji: copy verbatim

    out = []
    span_end = 0      # iterationMarkSpanEndPosition
    span_size = 0     # iterationMarksSpanSize
    n = len(text)
    for pos, c in enumerate(text):
        if c == _FULL_STOP:
            span_end = pos + 1
            out.append(c)
            continue
        if not is_mark(c):
            out.append(c)
            continue
        if pos < span_end:                       # inside current span
            out.append(norm(text[pos - span_size], c))
        elif pos == span_end:                    # illegal restart
            span_end += 1
            out.append(c)
        else:                                    # new span
            size = 0
            while pos + size < n and is_mark(text[pos + size]):
                size += 1
            if pos - size < span_end:
                size = pos - span_end
            span_size = size
            span_end = pos + size
            if size <= 0:
                out.append(c)
            else:
                out.append(norm(text[pos - size], c))
    return "".join(out)
