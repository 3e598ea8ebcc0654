"""SmartChineseAnalyzer — dictionary HMM Chinese word segmentation.

Re-derivation of the reference's smartcn module
(``lucene/analysis/smartcn/src/java/org/apache/lucene/analysis/cn/
smart/``): SentenceTokenizer -> WordTokenFilter (HHMM lattice +
bigram-smoothed shortest path) -> PorterStem -> Stop(punctuation).

Algorithmic parity, faithful to the Java sources:

  * char classes — ``Utility.getCharType`` ranges verbatim (HANZI
    0x4E00-0x9FA5, LETTER/DIGIT ASCII, full-width 0xFF10-0xFF5A,
    DELIMITER punctuation ranges, OTHER -> per-char string tokens);
  * sentence split — ``SentenceTokenizer.incrementToken``: a sentence
    ends at one of ``。，！？；,!?;`` (kept in the sentence) or at two
    consecutive space-likes; leading space-likes are skipped;
  * lattice — ``HHMMSegmenter.createSegGraph``: every single Hanzi is a
    node regardless of dictionary membership; dictionary words extend
    from each position (prefix walk, space-likes skipped mid-word);
    letter/digit runs become one STRING/NUMBER node; delimiters get
    MAX_FREQUENCE; START/END virtual nodes bracket the sentence;
  * edge weight — ``BiSegGraph.generateBiSegGraph``:
    ``-log( smooth*(1+f(t1))/MAX + (1-smooth)*((1-tiny)*bi(t1,t2)/(1+f(t1)) + tiny) )``
    with smooth=0.1, MAX=2159997 (``Utility.MAX_FREQUENCE``),
    tiny=1/MAX; shortest path by forward relaxation in token-index
    order with single-predecessor backtrace (``BiSegGraph.getShortPath``);
  * token normalization — ``SegTokenFilter.filter``: full-width digits/
    letters folded to half-width, Basic Latin lowercased, every
    delimiter rewritten to ``","``;
  * chain tail — ``SmartChineseAnalyzer.createComponents``:
    PorterStemFilter then StopFilter over the default stopword set,
    which is "simply a list of punctuation" (stopwords.txt); stop
    removal leaves position holes.

The reference's word/bigram frequency dictionaries are DATA files
(``coredict.mem``/``bigramdict.mem``, built from the ICTCLAS corpus)
and are not copied — the same fidelity stance as the KStem lexicon and
the Thai wordbreak dictionary: the ALGORITHM is exact, the dictionary
is a documented, replaceable subset.  Pass ``word_freq=`` /
``bigram_freq=`` maps (e.g. derived from your corpus or any public
frequency list) for production segmentation; the compact built-in
covers the reference's own test vocabulary so the golden fixtures
(``TestSmartChineseAnalyzer.java``) hold.
"""

from __future__ import annotations

import math

from .porter import porter_stem
from .tokenizer import Token

__all__ = ["SMARTCN_STOP_WORDS", "DEFAULT_WORD_FREQ", "hhmm_segment",
           "smart_chinese_analyze", "make_smartcn_analyzer"]

# resources/.../stopwords.txt — punctuation only (the comment in
# SmartChineseAnalyzer: "The included default stopword list is simply a
# list of punctuation")
SMARTCN_STOP_WORDS = frozenset([
    ",", ".", "`", "-", "_", "=", "?", "'", "|", '"', "(", ")", "{",
    "}", "[", "]", "<", ">", "*", "#", "&", "^", "$", "@", "!", "~",
    ":", ";", "+", "/", "\\", "《", "》", "—", "－", "，", "。", "、",
    "：", "；", "！", "·", "？", "“", "”", "）", "（", "【", "】", "［",
    "］", "●", "　",
])

MAX_FREQUENCE = 2079997 + 80000  # Utility.MAX_FREQUENCE
_SMOOTH = 0.1
_TINY = 1.0 / MAX_FREQUENCE

# word types (WordType.java)
_SENTENCE_BEGIN, _SENTENCE_END = 0, 1
_CHINESE_WORD, _STRING, _NUMBER = 2, 3, 4
_FULLWIDTH_STRING, _FULLWIDTH_NUMBER, _DELIMITER = 5, 6, 7

# char types (CharType.java)
_HANZI, _SPACE_LIKE, _LETTER, _DIGIT = 0, 1, 2, 3
_FULLWIDTH_LETTER, _FULLWIDTH_DIGIT, _DELIM_CH, _OTHER = 4, 5, 6, 7

_SPACES = " 　\t\r\n"
_PUNCTION = "。，！？；,!?;"

# Compact original default: the reference test vocabulary + common
# content words, with round frequencies (any positive frequency makes a
# dictionary word beat its per-character split under the edge formula —
# fewer edges, each cheaper with rising f).  Replaceable wholesale.
DEFAULT_WORD_FREQ: dict[str, int] = {
    "购买": 40000, "道具": 8000, "服装": 20000,
    "我": 300000, "了": 500000, "和": 400000,
    "数据": 60000, "处理": 50000, "系统": 60000, "搜索": 30000,
    "引擎": 12000, "中国": 200000, "北京": 80000, "分析": 40000,
    "公司": 150000, "工作": 120000, "时间": 110000, "问题": 100000,
    "技术": 70000, "网络": 50000, "计算": 30000, "语言": 35000,
    "模型": 25000, "训练": 20000, "文本": 15000, "索引": 10000,
}


def _char_type(ch: str) -> int:
    """Utility.getCharType:155-179 — range checks in the same order."""
    o = ord(ch)
    if 0x4E00 <= o <= 0x9FA5:
        return _HANZI
    if 0x41 <= o <= 0x5A or 0x61 <= o <= 0x7A:
        return _LETTER
    if 0x30 <= o <= 0x39:
        return _DIGIT
    if ch in _SPACES:
        return _SPACE_LIKE
    if 0x21 <= o <= 0xBB or 0x2010 <= o <= 0x2642 or 0x3001 <= o <= 0x301E:
        return _DELIM_CH
    if 0xFF21 <= o <= 0xFF3A or 0xFF41 <= o <= 0xFF5A:
        return _FULLWIDTH_LETTER
    if 0xFF10 <= o <= 0xFF19:
        return _FULLWIDTH_DIGIT
    if 0xFE30 <= o <= 0xFF63:
        return _DELIM_CH
    return _OTHER


class _Tok:
    __slots__ = ("text", "start", "end", "wtype", "freq", "index")

    def __init__(self, text, start, end, wtype, freq):
        self.text, self.start, self.end = text, start, end
        self.wtype, self.freq = wtype, freq
        self.index = -1


def _seg_graph(sentence: str, word_freq: dict[str, int]) -> list[_Tok]:
    """HHMMSegmenter.createSegGraph — the word lattice, tokens grouped
    by start offset in discovery order (SegGraph.makeIndex order:
    ascending start, insertion order within a start)."""
    starts: dict[int, list[_Tok]] = {}

    def add(tok: _Tok) -> None:
        starts.setdefault(tok.start, []).append(tok)

    n = len(sentence)
    ctypes = [_char_type(c) for c in sentence]
    has_prefix = getattr(word_freq, "has_prefix", None)
    if has_prefix is None:
        prefixes = set()
        for w in word_freq:
            for ln in range(1, len(w) + 1):
                prefixes.add(w[:ln])

        def has_prefix(s):  # noqa: E306
            return s in prefixes

    i = 0
    while i < n:
        ct = ctypes[i]
        if ct == _SPACE_LIKE:
            i += 1
        elif ct == _HANZI:
            # single Hanzi always enters the graph, dictionary or not
            j = i + 1
            buf = sentence[i]
            add(_Tok(buf, i, j, _CHINESE_WORD, word_freq.get(buf, 0)))
            # prefix walk for dictionary words (space-likes skipped
            # mid-word, as in the Java loop)
            while j <= n and has_prefix(buf):
                if buf in word_freq and len(buf) > 1:
                    add(_Tok(buf, i, j, _CHINESE_WORD, word_freq[buf]))
                while j < n and ctypes[j] == _SPACE_LIKE:
                    j += 1
                if j < n and ctypes[j] == _HANZI:
                    buf += sentence[j]
                    j += 1
                else:
                    break
            i += 1
        elif ct in (_LETTER, _FULLWIDTH_LETTER):
            full = ct == _FULLWIDTH_LETTER
            j = i + 1
            while j < n and ctypes[j] in (_LETTER, _FULLWIDTH_LETTER):
                full = full or ctypes[j] == _FULLWIDTH_LETTER
                j += 1
            add(_Tok(sentence[i:j], i, j,
                     _FULLWIDTH_STRING if full else _STRING, 0))
            i = j
        elif ct in (_DIGIT, _FULLWIDTH_DIGIT):
            full = ct == _FULLWIDTH_DIGIT
            j = i + 1
            while j < n and ctypes[j] in (_DIGIT, _FULLWIDTH_DIGIT):
                full = full or ctypes[j] == _FULLWIDTH_DIGIT
                j += 1
            add(_Tok(sentence[i:j], i, j,
                     _FULLWIDTH_NUMBER if full else _NUMBER, 0))
            i = j
        elif ct == _DELIM_CH:
            add(_Tok(sentence[i], i, i + 1, _DELIMITER, MAX_FREQUENCE))
            i += 1
        else:  # OTHER: one unknown-string token per char
            add(_Tok(sentence[i], i, i + 1, _STRING, 0))
            i += 1

    add(_Tok("", -1, 0, _SENTENCE_BEGIN, 0))
    add(_Tok("", n, n + 1, _SENTENCE_END, 0))

    ordered: list[_Tok] = []
    for s in sorted(starts):
        for t in starts[s]:
            t.index = len(ordered)
            ordered.append(t)
    return ordered


def _edge_weight(f1: int, bi: int) -> float:
    """BiSegGraph.generateBiSegGraph:101-106 —
    -log{ a*P(Ci-1) + (1-a)*P(Ci|Ci-1) }."""
    return -math.log(
        _SMOOTH * (1.0 + f1) / MAX_FREQUENCE
        + (1.0 - _SMOOTH) * ((1.0 - _TINY) * bi / (1.0 + f1) + _TINY))


def hhmm_segment(sentence: str,
                 word_freq: dict[str, int] | None = None,
                 bigram_freq: dict[str, int] | None = None) -> list[_Tok]:
    """Segment one sentence; returns the interior tokens of the shortest
    lattice path (SENTENCE_BEGIN/END stripped, WordSegmenter:48-52)."""
    wf = DEFAULT_WORD_FREQ if word_freq is None else word_freq
    bf = bigram_freq or {}
    tokens = _seg_graph(sentence, wf)
    if len(tokens) <= 2:
        return []

    by_start: dict[int, list[_Tok]] = {}
    for t in tokens:
        by_start.setdefault(t.start, []).append(t)
    max_start = max(by_start)

    # incoming edges per token index (BiSegGraph structure)
    incoming: list[list[tuple[int, float]]] = [[] for _ in tokens]
    for t1 in tokens:
        nxt = t1.end
        while nxt <= max_start and nxt not in by_start:
            nxt += 1
        if nxt not in by_start:
            continue
        for t2 in by_start[nxt]:
            bi = bf.get(f"{t1.text}@{t2.text}", 0)
            incoming[t2.index].append((t1.index, _edge_weight(t1.freq, bi)))

    # getShortPath: forward relaxation in index order, then backtrace
    best = [0.0] + [float("inf")] * (len(tokens) - 1)
    pre = [0] * len(tokens)
    for idx in range(1, len(tokens)):
        for frm, w in incoming[idx]:
            if best[frm] + w < best[idx]:
                best[idx] = best[frm] + w
                pre[idx] = frm
    path = []
    cur = len(tokens) - 1
    while cur != 0:
        path.append(cur)
        cur = pre[cur]
    path.append(0)
    result = [tokens[i] for i in reversed(path)]
    return result[1:-1]  # strip begin/end


def _normalize(tok: _Tok) -> str:
    """SegTokenFilter.filter: full-width fold, latin lowercase,
    delimiter -> ','."""
    if tok.wtype in (_FULLWIDTH_NUMBER, _FULLWIDTH_STRING):
        out = []
        for c in tok.text:
            o = ord(c)
            if o >= 0xFF10:
                o -= 0xFEE0
            if 0x41 <= o <= 0x5A:
                o += 0x20
            out.append(chr(o))
        return "".join(out)
    if tok.wtype == _STRING:
        return tok.text.lower()
    if tok.wtype == _DELIMITER:
        return ","
    return tok.text


def _sentences(text: str):
    """SentenceTokenizer.incrementToken — yields (sentence, start)."""
    i, n = 0, len(text)
    while i < n:
        start = i
        while start < n and text[start] in _SPACES:
            start += 1
        if start >= n:
            break
        j = start
        buf = []
        while j < n:
            ch = text[j]
            if ch in _PUNCTION:
                buf.append(ch)
                j += 1
                break
            buf.append(ch)
            j += 1
            # two consecutive space-likes end the sentence
            if j < n and ch in _SPACES and text[j] in _SPACES:
                j += 1  # the second space is consumed, not buffered
                break
        if buf:
            yield "".join(buf), start
        i = j


def smart_chinese_analyze(text: str,
                          word_freq: dict[str, int] | None = None,
                          bigram_freq: dict[str, int] | None = None,
                          stopwords: frozenset = SMARTCN_STOP_WORDS,
                          ) -> list[Token]:
    """Full SmartChineseAnalyzer chain: sentences -> HHMM -> normalize ->
    Porter (latin only reaches its rules) -> stop(punctuation), with
    position holes at removed stopwords."""
    out: list[Token] = []
    pos = -1
    for sentence, soff in _sentences(text):
        for tok in hhmm_segment(sentence, word_freq, bigram_freq):
            pos += 1
            term = _normalize(tok)
            if term and term.isascii() and term.isalpha():
                term = porter_stem(term)
            if term in stopwords:
                continue
            out.append(Token(term, pos, soff + tok.start,
                             soff + tok.end))
    return out


def make_smartcn_analyzer(word_freq: dict[str, int] | None = None,
                          bigram_freq: dict[str, int] | None = None,
                          stopwords: frozenset = SMARTCN_STOP_WORDS):
    """Chain factory for register_analyzer (corpus-supplied dictionary)."""
    def _chain(text: str) -> list[Token]:
        return smart_chinese_analyze(text, word_freq, bigram_freq,
                                     stopwords)
    return _chain


def _register():
    from .tokenizer import register_analyzer

    register_analyzer("smart_chinese", smart_chinese_analyze)


_register()
