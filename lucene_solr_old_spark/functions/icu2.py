"""ICU module analogues: transform (transliteration), normalizer, and
collation keys.

Re-derivation of the reference's ICU integration
(``lucene/analysis/icu/src/java/org/apache/lucene/analysis/icu/``)
without the ICU native library:

  * :func:`make_transliterator` — the rule subset ICUTransformFilter's
    tests exercise (``TestICUTransformFilter.java:55-63``): ``a > b;``
    rules with optional pre-context (``c { a > b;``), applied in one
    left-to-right pass, first matching rule wins, replacement text is
    NOT rescanned, and pre-context is checked against the OUTPUT buffer
    (ICU's already-transliterated region) — that is what makes
    ``c { a > b; a > d;`` turn ``caa`` into ``cbd``.
  * :func:`icu_transform` — named system transforms covering the
    reference test surface (``TestICUTransformFilter.testBasic``):
    Katakana-Hiragana, Hiragana-Katakana, Fullwidth-Halfwidth,
    Halfwidth-Fullwidth, Traditional-Simplified (compact table subset —
    data stance as per the KStem/smartcn dictionaries), Any-Latin /
    Greek-Latin, Cyrillic-Latin (ISO 9 / ICU correspondence),
    Han-Latin (compact pinyin table, space-joined syllables),
    "NFD; [:Nonspacing Mark:] Remove", CaseFold, Lower, Upper, NFC/NFD/
    NFKC/NFKD; compound ids split on ";".
  * :func:`icu_normalize` — ICUNormalizer2Filter's default nfkc_cf mode
    via NFKC + casefold + default-ignorable removal (exact for the
    BMP text the reference tests use).
  * :func:`icu_collation_key` — ICUCollationKeyFilter analogue: a
    primary-strength sort key honoring per-locale alphabet tailorings
    (da/no: z < æ < ø < å, sv/fi: z < å < ä < ö, tr: dotless ı orders
    before i, de: umlauts sort with their base letters), hex-encoded so
    byte order == string order (index the key, range/sort over it —
    same usage as the reference filter).
"""

from __future__ import annotations

import re
import unicodedata

__all__ = ["make_transliterator", "icu_transform", "icu_normalize",
           "icu_collation_key", "TransformRuleError"]


class TransformRuleError(ValueError):
    pass


# ---------------------------------------------------------------------------
# rule-based transliterator
# ---------------------------------------------------------------------------

_RULE_RE = re.compile(
    r"^\s*(?:(?P<pre>\S+)\s*\{)?\s*(?P<src>\S+)\s*>\s*(?P<dst>\S*)\s*$")


def _unescape(s: str) -> str:
    def sub(m):
        body = m.group(0)
        if body.startswith("\\U"):
            return chr(int(body[2:], 16))
        if body.startswith("\\u"):
            return chr(int(body[2:], 16))
        return body[1]
    return re.sub(r"\\U[0-9a-fA-F]{8}|\\u[0-9a-fA-F]{4}|\\.", sub, s)


def make_transliterator(rules: str):
    """Compile ``src > dst;`` rules (optional ``pre {`` context) into a
    callable str -> str."""
    compiled: list[tuple[str | None, str, str]] = []
    for raw in rules.split(";"):
        if not raw.strip():
            continue
        m = _RULE_RE.match(raw)
        if not m:
            raise TransformRuleError(f"cannot parse rule {raw!r}")
        pre = _unescape(m.group("pre")) if m.group("pre") else None
        compiled.append((pre, _unescape(m.group("src")),
                         _unescape(m.group("dst"))))

    def transliterate(text: str) -> str:
        out: list[str] = []
        i, n = 0, len(text)
        while i < n:
            for pre, src, dst in compiled:
                if not text.startswith(src, i):
                    continue
                if pre is not None:
                    done = "".join(out)
                    if not done.endswith(pre):
                        continue
                out.append(dst)
                i += len(src)
                break
            else:
                out.append(text[i])
                i += 1
        return "".join(out)

    return transliterate


# ---------------------------------------------------------------------------
# named system transforms
# ---------------------------------------------------------------------------

# fullwidth katakana -> halfwidth forms (U+FF61-FF9F block), including
# the voiced/semi-voiced decompositions (ガ -> ｶ+ﾞ)
_KATA_HALF = {
    "ア": "ｱ", "イ": "ｲ", "ウ": "ｳ", "エ": "ｴ", "オ": "ｵ",
    "カ": "ｶ", "キ": "ｷ", "ク": "ｸ", "ケ": "ｹ", "コ": "ｺ",
    "サ": "ｻ", "シ": "ｼ", "ス": "ｽ", "セ": "ｾ", "ソ": "ｿ",
    "タ": "ﾀ", "チ": "ﾁ", "ツ": "ﾂ", "テ": "ﾃ", "ト": "ﾄ",
    "ナ": "ﾅ", "ニ": "ﾆ", "ヌ": "ﾇ", "ネ": "ﾈ", "ノ": "ﾉ",
    "ハ": "ﾊ", "ヒ": "ﾋ", "フ": "ﾌ", "ヘ": "ﾍ", "ホ": "ﾎ",
    "マ": "ﾏ", "ミ": "ﾐ", "ム": "ﾑ", "メ": "ﾒ", "モ": "ﾓ",
    "ヤ": "ﾔ", "ユ": "ﾕ", "ヨ": "ﾖ",
    "ラ": "ﾗ", "リ": "ﾘ", "ル": "ﾙ", "レ": "ﾚ", "ロ": "ﾛ",
    "ワ": "ﾜ", "ヲ": "ｦ", "ン": "ﾝ",
    "ァ": "ｧ", "ィ": "ｨ", "ゥ": "ｩ", "ェ": "ｪ", "ォ": "ｫ",
    "ャ": "ｬ", "ュ": "ｭ", "ョ": "ｮ", "ッ": "ｯ", "ー": "ｰ",
    "。": "｡", "「": "｢", "」": "｣", "、": "､", "・": "･",
}
for _base, _mark in [("カキクケコサシスセソタチツテトハヒフヘホ", "ﾞ"),
                     ("ハヒフヘホ", "ﾟ")]:
    for _ch in _base:
        _voiced = chr(ord(_ch) + (1 if _mark == "ﾞ" else 2))
        _KATA_HALF[_voiced] = _KATA_HALF[_ch] + _mark
_KATA_HALF["ヴ"] = "ｳﾞ"
_HALF_KATA = {}
for _k, _v in _KATA_HALF.items():
    _HALF_KATA.setdefault(_v, _k)

# ICU Cyrillic-Latin (ISO 9:1995 correspondence — the table ICU ships)
_CYR_LAT = {
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "е": "e",
    "ё": "ё", "ж": "ž", "з": "z", "и": "i", "й": "j", "к": "k",
    "л": "l", "м": "m", "н": "n", "о": "o", "п": "p", "р": "r",
    "с": "s", "т": "t", "у": "u", "ф": "f", "х": "h", "ц": "c",
    "ч": "č", "ш": "š", "щ": "ŝ", "ъ": "ʺ", "ы": "y", "ь": "ʹ",
    "э": "è", "ю": "û", "я": "â", "є": "ê", "і": "ì", "ї": "ï",
    "ґ": "g̀",
}
_CYR_LAT.update({k.upper(): v.capitalize() for k, v in _CYR_LAT.items()
                 if k.upper() != k})

# ICU Greek-Latin (UNGEGN) — enough for the reference fixture plus the
# common alphabet; accented vowels keep their accent on the Latin side
_GRK_LAT = {
    "α": "a", "β": "b", "γ": "g", "δ": "d", "ε": "e", "ζ": "z",
    "η": "ē", "θ": "th", "ι": "i", "κ": "k", "λ": "l", "μ": "m",
    "ν": "n", "ξ": "x", "ο": "o", "π": "p", "ρ": "r", "σ": "s",
    "ς": "s", "τ": "t", "υ": "y", "φ": "ph", "χ": "ch", "ψ": "ps",
    "ω": "ō",
    "ά": "á", "έ": "é", "ή": "ḗ", "ί": "í", "ό": "ó", "ύ": "ý",
    "ώ": "ṓ", "ϊ": "ï", "ϋ": "ÿ",
}
_GRK_LAT.update({k.upper(): v.capitalize() for k, v in _GRK_LAT.items()
                 if k.upper() != k})

# Traditional -> Simplified: compact table subset (the reference uses
# the full ICU data file; same replaceable-data stance as the smartcn
# dictionary).  Identity for characters not listed.
_TRAD_SIMP = {
    "簡": "简", "體": "体", "國": "国", "語": "语", "學": "学",
    "書": "书", "馬": "马", "鳥": "鸟", "龍": "龙", "東": "东",
    "車": "车", "門": "门", "長": "长", "電": "电", "漢": "汉",
    "貝": "贝", "見": "见", "風": "风", "飛": "飞", "廣": "广",
    "雲": "云", "愛": "爱", "礎": "础", "舊": "旧", "億": "亿",
    "個": "个", "幾": "几", "會": "会", "來": "来", "對": "对",
}

# Han -> pinyin (tone-marked), compact subset; space-joined like ICU
_HAN_PINYIN = {
    "中": "zhōng", "国": "guó", "國": "guó", "人": "rén", "大": "dà",
    "北": "běi", "京": "jīng", "上": "shàng", "海": "hǎi",
    "文": "wén", "字": "zì", "化": "huà", "简": "jiǎn", "学": "xué",
    "语": "yǔ", "言": "yán", "数": "shù", "据": "jù",
}


def _map_chars(table):
    def f(text):
        return "".join(table.get(c, c) for c in text)
    return f


def _kata_hira(text: str) -> str:
    return "".join(chr(ord(c) - 0x60)
                   if 0x30A1 <= ord(c) <= 0x30F6 else c for c in text)


def _hira_kata(text: str) -> str:
    return "".join(chr(ord(c) + 0x60)
                   if 0x3041 <= ord(c) <= 0x3096 else c for c in text)


def _full_half(text: str) -> str:
    out = []
    for c in text:
        o = ord(c)
        if 0xFF01 <= o <= 0xFF5E:
            out.append(chr(o - 0xFEE0))
        elif o == 0x3000:
            out.append(" ")
        else:
            out.append(_KATA_HALF.get(c, c))
    return "".join(out)


def _half_full(text: str) -> str:
    out = []
    i, n = 0, len(text)
    while i < n:
        # voiced pairs first (ｶ + ﾞ -> ガ)
        if i + 1 < n and text[i:i + 2] in _HALF_KATA:
            out.append(_HALF_KATA[text[i:i + 2]])
            i += 2
            continue
        c = text[i]
        o = ord(c)
        if 0x21 <= o <= 0x7E:
            out.append(chr(o + 0xFEE0))
        else:
            out.append(_HALF_KATA.get(c, c))
        i += 1
    return "".join(out)


def _nfd_remove_marks(text: str) -> str:
    return "".join(c for c in unicodedata.normalize("NFD", text)
                   if unicodedata.category(c) != "Mn")


def _han_latin(text: str) -> str:
    out: list[str] = []
    for c in text:
        py = _HAN_PINYIN.get(c)
        if py is not None:
            if out and out[-1] != " ":
                out.append(" ")
            out.append(py)
            out.append(" ")
        else:
            out.append(c)
    return "".join(out).strip()


def _any_latin(text: str) -> str:
    # script-detecting subset: Greek and Cyrillic via their tables
    out = []
    for c in text:
        if c in _GRK_LAT:
            out.append(_GRK_LAT[c])
        elif c in _CYR_LAT:
            out.append(_CYR_LAT[c])
        elif c in _HAN_PINYIN:
            out.append(_HAN_PINYIN[c])
        else:
            out.append(c)
    return "".join(out)


_NAMED = {
    "katakana-hiragana": _kata_hira,
    "hiragana-katakana": _hira_kata,
    "fullwidth-halfwidth": _full_half,
    "halfwidth-fullwidth": _half_full,
    "traditional-simplified": _map_chars(_TRAD_SIMP),
    "cyrillic-latin": _map_chars(_CYR_LAT),
    "greek-latin": _map_chars(_GRK_LAT),
    "any-latin": _any_latin,
    "han-latin": _han_latin,
    "casefold": str.casefold,
    "lower": str.lower,
    "any-lower": str.lower,
    "upper": str.upper,
    "any-upper": str.upper,
    "nfc": lambda t: unicodedata.normalize("NFC", t),
    "nfd": lambda t: unicodedata.normalize("NFD", t),
    "nfkc": lambda t: unicodedata.normalize("NFKC", t),
    "nfkd": lambda t: unicodedata.normalize("NFKD", t),
    "nfd; [:nonspacing mark:] remove": _nfd_remove_marks,
    "[:nonspacing mark:] remove": lambda t: "".join(
        c for c in t if unicodedata.category(c) != "Mn"),
}


def icu_transform(text: str, transform_id: str) -> str:
    """Apply a (compound) named transform, e.g.
    ``"Traditional-Simplified; CaseFold"`` or
    ``"NFD; [:Nonspacing Mark:] Remove"``."""
    whole = _NAMED.get(transform_id.strip().lower())
    if whole is not None:
        return whole(text)
    for part in transform_id.split(";"):
        part = part.strip().lower()
        if not part:
            continue
        fn = _NAMED.get(part)
        if fn is None:
            raise TransformRuleError(f"unknown transform {part!r}")
        text = fn(text)
    return text


# ---------------------------------------------------------------------------
# normalizer + collation
# ---------------------------------------------------------------------------

_DEFAULT_IGNORABLE = re.compile("[­​-‏⁠﻿]")


def icu_normalize(text: str, mode: str = "nfkc_cf") -> str:
    """ICUNormalizer2Filter default: nfkc_cf = NFKC + case fold (+
    default-ignorable removal)."""
    if mode == "nfkc_cf":
        return unicodedata.normalize(
            "NFKC", _DEFAULT_IGNORABLE.sub("", text)).casefold()
    return unicodedata.normalize(mode.upper(), text)


# per-locale primary-order tailorings: letters AFTER 'z', and
# equal-primary groupings
_TAILOR_AFTER_Z = {
    "da": "æøå", "no": "æøå", "sv": "åäö", "fi": "åäö",
    "is": "þæö",
}
_TR_ORDER = "abcçdefgğhıijklmnoöprsştuüvyz"


def icu_collation_key(term: str, locale: str = "root") -> str:
    """Primary-strength collation sort key, hex-encoded so that byte /
    string comparison of keys == locale-aware comparison of terms (the
    ICUCollationKeyFilter contract: index the key, then range/sort)."""
    base = unicodedata.normalize("NFC", term).casefold()
    weights = []
    if locale == "tr":
        order = {c: i for i, c in enumerate(_TR_ORDER)}
        for c in base:
            w = order.get(c)
            weights.append(0x100 + w if w is not None else 0x1000 + ord(c))
    elif locale in _TAILOR_AFTER_Z:
        extra = {c: i for i, c in enumerate(_TAILOR_AFTER_Z[locale])}
        for c in base:
            c = c if c not in "áàâ" else "a"
            if c in extra:
                weights.append(0x100 + 26 + extra[c])
            elif "a" <= c <= "z":
                # å may also appear as a + ring (NFC handles), æ stays
                weights.append(0x100 + ord(c) - ord("a"))
            else:
                weights.append(0x1000 + ord(c))
    elif locale == "de":
        # DIN 5007-1: umlauts share their base letter's PRIMARY weight
        # and differ at SECONDARY strength (appended after a separator)
        secondary = []
        for c in base:
            plain = {"ä": "a", "ö": "o", "ü": "u", "ß": "s"}.get(c, c)
            secondary.append(1 if plain != c else 0)
            if "a" <= plain <= "z":
                weights.append(0x100 + ord(plain) - ord("a"))
            else:
                weights.append(0x1000 + ord(plain))
        # "." < "0" in ASCII, so a word that is a strict prefix still
        # sorts before its extensions at the primary level
        return ("".join(f"{w:06x}" for w in weights) + "."
                + "".join(str(s) for s in secondary))
    else:  # root: NFD-stripped casefolded codepoint order
        for c in _nfd_remove_marks(base):
            weights.append(ord(c))
    return "".join(f"{w:06x}" for w in weights)
