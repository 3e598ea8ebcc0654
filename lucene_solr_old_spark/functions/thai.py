"""Thai analysis — the reference's ``th/ThaiAnalyzer.java`` chain:
StandardTokenizer -> ThaiWordFilter -> LowerCase -> Stop(thai).

``ThaiWordFilter`` (``th/ThaiWordFilter.java:60-75``) re-segments each
Thai-script token with ``BreakIterator.getWordInstance(new
Locale("th"))`` — a DICTIONARY-driven word breaker.  No ICU ships in
this environment, so the segmenter here is pluggable maximal matching
(greedy longest-match, the classic Thai wordbreak algorithm the ICU
break engine also builds on) over a compact built-in lexicon — the same
fidelity stance as the KStem lexicon: the ALGORITHMIC chain is exact,
the dictionary is a documented, replaceable subset (pass ``lexicon=`` to
:func:`thai_segment` / supply a corpus dictionary at build time).

The built-in lexicon covers the reference's own test goldens
(``TestThaiAnalyzer.java:49-100``: การที่ได้ต้องแสดงว่างานดี ->
การ|ที่|ได้|ต้อง|แสดง|ว่า|งาน|ดี) and the full reference stopword list
(``th/stopwords.txt`` — Sukhum/Nitsuwat/Haruechaiyasak); runs with no
dictionary hit fall back to Thai-cluster chunks (a leading-vowel /
combining-mark grouping), so unknown text still tokenizes stably.

Stopword set: the reference's 115-word ``th/stopwords.txt`` verbatim.
"""

from __future__ import annotations

from .tokenizer import Token, standard_tokenize

__all__ = ["THAI_STOP_WORDS", "thai_segment", "thai_word_tokens",
           "thai_analyze", "THAI_LEXICON"]

# th/stopwords.txt (every non-comment line)
THAI_STOP_WORDS = frozenset("""
ไว้ ไม่ ไป ได้ ให้ ใน โดย แห่ง แล้ว และ แรก แบบ แต่ เอง เห็น เลย เริ่ม เรา
เมื่อ เพื่อ เพราะ เป็นการ เป็น เปิดเผย เปิด เนื่องจาก เดียวกัน เดียว เช่น
เฉพาะ เคย เข้า เขา อีก อาจ อะไร ออก อย่าง อยู่ อยาก หาก หลาย หลังจาก หลัง
หรือ หนึ่ง ส่วน ส่ง สุด สําหรับ ว่า วัน ลง ร่วม ราย รับ ระหว่าง รวม ยัง มี
มาก มา พร้อม พบ ผ่าน ผล บาง น่า นี้ นํา นั้น นัก นอกจาก ทุก ที่สุด ที่
ทําให้ ทํา ทาง ทั้งนี้ ทั้ง ถ้า ถูก ถึง ต้อง ต่างๆ ต่าง ต่อ ตาม ตั้งแต่
ตั้ง ด้าน ด้วย ดัง ซึ่ง ช่วง จึง จาก จัด จะ คือ ความ ครั้ง คง ขึ้น ของ ขอ
ขณะ ก่อน ก็ การ กับ กัน กว่า กล่าว
""".split())

# Compact default lexicon: the stopwords (they ARE the highest-frequency
# Thai words) + the reference test vocabulary + common content words.
THAI_LEXICON = frozenset(THAI_STOP_WORDS | {
    "แสดง", "งาน", "ดี", "บริษัท", "ชื่อ", "คุย", "แมว", "กิน", "ปลา",
    "ข้าว", "น้ำ", "คน", "ไทย", "ภาษา", "หนังสือ", "โรงเรียน", "บ้าน",
    "เมือง", "ประเทศ", "รถ", "เดิน", "นอน", "รัก", "เด็ก", "ผู้หญิง",
    "ผู้ชาย", "เวลา", "ปี", "เดือน", "สวย", "ใหญ่", "เล็ก", "ใหม่",
    "เก่า", "ร้าน", "ตลาด", "เงิน", "ซื้อ", "ขาย", "พูด", "ฟัง", "อ่าน",
    "เขียน", "เรียน", "สอน", "ทำ", "มือ", "ใจ", "ตา", "หัว", "รู้",
    "คิด", "ใช้", "อยู่ที่", "๑๒๓", "เธอ", "ไหน",
})

_THAI_RANGE = (0x0E00, 0x0E7F)
# characters that must not START a fallback cluster (combining marks,
# sara am, tone marks) and leading vowels that glue to the NEXT cluster
_NO_START = frozenset(
    "ะัาำิีึืฺุู"
    "ๅ็่้๊๋์ํ๎")
_LEAD_VOWELS = frozenset("เแโใไ")


def is_thai(ch: str) -> bool:
    return _THAI_RANGE[0] <= ord(ch) <= _THAI_RANGE[1]


def _fallback_cluster_end(run: str, i: int) -> int:
    """End of one display cluster starting at i: optional leading vowel,
    a base consonant, then any trailing combining marks."""
    n = len(run)
    j = i
    if j < n and run[j] in _LEAD_VOWELS:
        j += 1
    if j < n:
        j += 1
    while j < n and run[j] in _NO_START:
        j += 1
    return j


def thai_segment(run: str, lexicon: frozenset[str] = THAI_LEXICON,
                 max_word: int = 20) -> list[str]:
    """Greedy maximal matching over ``lexicon``; on a miss, consume
    display clusters until the next dictionary hit (so unknown words
    come out as single chunks, not char confetti)."""
    out: list[str] = []
    i, n = 0, len(run)
    unk_start = -1
    while i < n:
        hit = None
        for ln in range(min(max_word, n - i), 0, -1):
            cand = run[i: i + ln]
            if cand in lexicon:
                # a lexicon word must not strand a following combining
                # mark (e.g. matching "อย" out of "อย่าง")
                end = i + ln
                if end < n and run[end] in _NO_START:
                    continue
                hit = cand
                break
        if hit is not None:
            if unk_start >= 0:
                out.append(run[unk_start: i])
                unk_start = -1
            out.append(hit)
            i += len(hit)
        else:
            if unk_start < 0:
                unk_start = i
            i = _fallback_cluster_end(run, i)
    if unk_start >= 0:
        out.append(run[unk_start:])
    return out


def thai_word_tokens(tokens: list[Token],
                     lexicon: frozenset[str] = THAI_LEXICON) -> list[Token]:
    """ThaiWordFilter: re-segment Thai-script tokens; non-Thai tokens
    pass through.  Each produced word takes the next position increment
    (the 4.x filter emits them as consecutive positions)."""
    out: list[Token] = []
    pos = -1
    for t in tokens:
        if t.term and is_thai(t.term[0]):
            off = t.start
            for seg in thai_segment(t.term, lexicon):
                pos += 1
                out.append(Token(seg, pos, off, off + len(seg)))
                off += len(seg)
        else:
            pos += 1
            out.append(Token(t.term, pos, t.start, t.end))
    return out


def thai_analyze(text: str,
                 lexicon: frozenset[str] = THAI_LEXICON) -> list[Token]:
    """ThaiAnalyzer chain: standard -> ThaiWordFilter -> lowercase ->
    stop(thai).  Thai-script runs are grouped FIRST (UAX#29 keeps a Thai
    ALetter+Extend run as one token, which the repo's ASCII-oriented DFA
    would split at combining marks) and dictionary-segmented; everything
    else goes through the standard tokenizer.  Stop removal leaves
    position holes (StopFilter semantics)."""
    pre: list[tuple[str, int, int]] = []  # (term, start, end)
    i, n = 0, len(text)
    while i < n:
        if is_thai(text[i]):
            j = i
            while j < n and is_thai(text[j]):
                j += 1
            pre.append((text[i:j], i, j))
            i = j
        else:
            j = i
            while j < n and not is_thai(text[j]):
                j += 1
            for term, _p, s, e in standard_tokenize(text[i:j]):
                pre.append((term, i + s, i + e))
            i = j
    pos = -1
    out: list[Token] = []
    for term, s, e in pre:
        if term and is_thai(term[0]):
            off = s
            for seg in thai_segment(term, lexicon):
                pos += 1
                if seg.lower() not in THAI_STOP_WORDS:
                    out.append(Token(seg, pos, off, off + len(seg)))
                off += len(seg)
        else:
            pos += 1
            low = term.lower()
            if low not in THAI_STOP_WORDS:
                out.append(Token(low, pos, s, e))
    return out
