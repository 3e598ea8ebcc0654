"""WikipediaTokenizer — MediaWiki-markup-aware tokenization.

Re-derivation of the reference's JFlex scanner
(``analysis/common/src/java/org/apache/lucene/analysis/wikipedia/
WikipediaTokenizerImpl.jflex`` + ``WikipediaTokenizer.java``) as an
explicit state machine: per lexical state an ordered rule list, JFlex
maximal-munch dispatch (longest match wins, rule order breaks ties),
and the exact scanner-state variables (``currentTokType``,
``numBalanced``, ``positionInc``, ``numLinkToks``,
``numWikiTokensSeen``).

Behavior pinned by the reference's own ``WikipediaTokenizerTest``
goldens: category/internal/external-link states, the quote ladder
('' -> italics, ''' -> bold, ''''' -> bold-italics, closed from the
STRING state), ==heading== / ===sub heading===, {{citation}} and
<ref>...</ref>, infobox skip, HTML tag skip, the external-link URL
grammar, and the position-increment contract (first anchor word of an
external link shares its URL's position; the tokenizer never emits
positionIncrement 0 for the very first token).

Output modes mirror ``WikipediaTokenizer``: TOKENS_ONLY (default),
UNTOKENIZED_ONLY (wiki-typed token runs collapsed into one
space-joined token carrying UNTOKENIZED_TOKEN_FLAG), and BOTH
(collapsed token first, then the individual tokens — the LUCENE-1133
surface).
"""

from __future__ import annotations

import re

__all__ = ["WikiToken", "wikipedia_tokenize", "TOKENS_ONLY",
           "UNTOKENIZED_ONLY", "BOTH", "UNTOKENIZED_TOKEN_FLAG",
           "TOKEN_TYPES"]

TOKENS_ONLY, UNTOKENIZED_ONLY, BOTH = 0, 1, 2
UNTOKENIZED_TOKEN_FLAG = 1

(ALPHANUM, APOSTROPHE, ACRONYM, COMPANY, EMAIL, HOST, NUM, CJ,
 INTERNAL_LINK, EXTERNAL_LINK, CITATION, CATEGORY, BOLD, ITALICS,
 BOLD_ITALICS, HEADING, SUB_HEADING, EXTERNAL_LINK_URL) = range(18)

TOKEN_TYPES = ["<ALPHANUM>", "<APOSTROPHE>", "<ACRONYM>", "<COMPANY>",
               "<EMAIL>", "<HOST>", "<NUM>", "<CJ>", "il", "el", "ci",
               "c", "b", "i", "bi", "h", "sh", "elu"]

# character classes — WikipediaTokenizerImpl.jflex:152-160 verbatim
_LETTER = ("A-Za-zÀ-ÖØ-öø-ÿ"
           "Ā-῿ﾠ-ￜ")
_DIGIT = ("0-9٠-٩۰-۹०-९০-৯"
          "੦-੯૦-૯୦-୯௧-௯"
          "౦-౯೦-೯൦-൯๐-๙"
          "໐-໙၀-၉")
_KOREAN = "가-힯ᄀ-ᇿ"
_CJ = ("぀-㆏㄀-ㄯ゠-ヿㇰ-ㇿ"
       "㌀-㍿㐀-䶿一-鿿豈-﫿"
       "･-ﾟ")

_AN = f"[{_LETTER}{_DIGIT}{_KOREAN}]+"              # ALPHANUM
_ALPHA = f"[{_LETTER}]+"
_P = "[-_/.,]"
_HD = f"[{_LETTER}{_DIGIT}]*[{_DIGIT}][{_LETTER}{_DIGIT}]*"  # HAS_DIGIT
_NUM = (f"(?:{_AN}{_P}{_HD}"
        f"|[{_DIGIT}]+{_P}[{_DIGIT}]+"
        f"|{_HD}{_P}{_AN}"
        f"|{_AN}(?:{_P}{_HD}{_P}{_AN})+"
        f"|{_HD}(?:{_P}{_AN}{_P}{_HD})+"
        f"|{_AN}{_P}{_HD}(?:{_P}{_AN}{_P}{_HD})+"
        f"|{_HD}{_P}{_AN}(?:{_P}{_HD}{_P}{_AN})+)")
_WS = r"(?:\r\n|[ \r\n\t\f])"
_TAGS = f'</?{_AN}(?:{_WS}*{_AN}="{_AN}")*>'
_HOST_RE = f"{_AN}(?:\\.{_AN})+"
# jflex: ("http://"|"https://"){HOST}("/"?({ALPHANUM}|{P}|?|&|=|#)*)*
# — rewritten to the equivalent single star (each outer group is a "/"
# or one inner atom) to avoid nested-star backtracking in Python re
_URL = (f"(?:http://|https://){_HOST_RE}"
        f"(?:/|{_AN}|[-_/.,?&=#])*")

# states
(_INITIAL, _CAT, _ILINK, _ELINK, _TWOQ, _THREEQ, _FIVEQ, _DEQ,
 _DBRACE, _STR) = range(10)


class WikiToken:
    __slots__ = ("term", "type", "pos_inc", "start", "end", "flags")

    def __init__(self, term, type_, pos_inc, start, end, flags=0):
        self.term, self.type, self.pos_inc = term, type_, pos_inc
        self.start, self.end, self.flags = start, end, flags

    def __repr__(self):
        return (f"WikiToken({self.term!r}, {self.type}, +{self.pos_inc}, "
                f"{self.start}-{self.end}, f={self.flags})")

    def __eq__(self, other):
        return (self.term, self.type, self.pos_inc, self.start,
                self.end, self.flags) == \
               (other.term, other.type, other.pos_inc, other.start,
                other.end, other.flags)


class _Scanner:
    """WikipediaTokenizerImpl: getNextToken over the rule tables, with
    JFlex maximal munch (longest match; ties -> earliest rule)."""

    def __init__(self, text: str):
        self.text = text
        self.i = 0
        self.state = _INITIAL
        self.cur = 0              # currentTokType
        self.num_balanced = 0
        self.position_inc = 1
        self.num_link_toks = 0
        self.num_wiki_seen = 0
        # (tok_type, text, start) of the last returned/scanned token
        self.last = None

    # rule actions return the token id to EMIT, or None to continue
    def _rules(self, state):
        return _RULES[state]

    def push_back(self):
        """yypushback(yylength()) — rewind the last match."""
        self.i = self.last_start

    def next_token(self):
        """-> (type_id, term, start) or None at EOF."""
        text, n = self.text, len(self.text)
        while self.i < n:
            best_len, best_action = 0, None
            for rx, action in self._rules(self.state):
                m = rx.match(text, self.i)
                if m and m.end() - m.start() > best_len:
                    best_len, best_action = m.end() - m.start(), action
            if best_action is None:  # lone surrogate etc.: skip 1
                best_len = 1

                def best_action(s, t):  # noqa: E306
                    return None
            start = self.i
            tok = text[start:start + best_len]
            self.i = start + best_len
            emit = best_action(self, tok)
            if emit is not None:
                self.last_start = start
                self.last = (emit, tok, start)
                return self.last
        return None


# ---- rule actions ----------------------------------------------------------

def _ret(tok_id, inc=None):
    def act(s, t):
        if inc is not None:
            s.position_inc = inc
        return tok_id
    return act


def _ignore_init(s, t):
    s.num_wiki_seen = 0
    s.position_inc = 1
    return None


def _enter(state, cur=None, reset_seen=True, reset_balanced=False,
           set_posinc=True):
    def act(s, t):
        if reset_seen:
            s.num_wiki_seen = 0
        if reset_balanced:
            s.num_balanced = 0
        if set_posinc:
            s.position_inc = 1
        if cur is not None:
            s.cur = cur
        s.state = state
        return None
    return act


def _two_quotes(s, t):
    s.num_wiki_seen = 0
    s.position_inc = 1
    if s.num_balanced == 0:
        s.num_balanced += 1
        s.state = _TWOQ
    else:
        s.num_balanced = 0
    return None


def _wiki_word(s, t):
    s.num_wiki_seen += 1
    return s.cur


def _ignore_posinc1(s, t):
    s.position_inc = 1
    return None


def _ignore(s, t):
    return None


def _close_ilink(s, t):
    s.num_link_toks = 0
    s.state = _INITIAL
    return None


def _elink_url(s, t):
    s.position_inc = 1
    s.num_wiki_seen += 1
    return s.cur


def _elink_word(s, t):
    s.position_inc = 0 if s.num_link_toks == 0 else 1
    s.num_wiki_seen += 1
    s.cur = EXTERNAL_LINK
    s.num_link_toks += 1
    return s.cur


def _close_elink(s, t):
    s.num_link_toks = 0
    s.position_inc = 0
    s.state = _INITIAL
    return None


def _to_initial(s, t):
    s.state = _INITIAL
    return None


def _quote_word(cur=None):
    def act(s, t):
        if cur is not None:
            s.cur = cur
        s.num_wiki_seen += 1
        s.state = _STR
        return s.cur
    return act


def _str_end(s, t):
    s.num_balanced = 0
    s.cur = ALPHANUM
    s.state = _INITIAL
    return None


def _deq_sub(s, t):
    s.cur = SUB_HEADING
    s.num_wiki_seen = 0
    s.state = _STR
    return None


def _deq_word(s, t):
    s.cur = HEADING
    s.num_wiki_seen += 1
    return HEADING


def _brace_word(s, t):
    s.num_wiki_seen = 0  # jflex: DOUBLE_BRACE_STATE resets, not ++
    return s.cur


def _str_word(s, t):
    s.num_wiki_seen += 1
    return s.cur


def _str_pipe(s, t):
    return s.cur


def _link_overrides(reset_balanced=False):
    # links override inside quote/string states; "[" sets EXTERNAL_LINK
    # (not EXTERNAL_LINK_URL) there, and none touch positionInc; the
    # STRING group additionally resets numBalanced — jflex
    # TWO/THREE/FIVE/STRING state groups
    kw = dict(reset_balanced=reset_balanced, set_posinc=False)
    return [
        (re.compile(r"\[\[:?Category:"), _enter(_CAT, CATEGORY, **kw)),
        (re.compile(r"\[\["), _enter(_ILINK, INTERNAL_LINK, **kw)),
        (re.compile(r"\["), _enter(_ELINK, EXTERNAL_LINK, **kw)),
    ]


def _c(p):
    return re.compile(p)


_CATCHALL = [(_c(_TAGS), _ignore), (_c(_WS), _ignore),
             (_c(r"(?s)."), _ignore)]

_RULES = {
    _INITIAL: [
        (_c(_AN), _ret(ALPHANUM, 1)),
        (_c(f"{_ALPHA}(?:'{_ALPHA})+"), _ret(APOSTROPHE, 1)),
        (_c(f"[{_LETTER}]+\\.(?:[{_LETTER}]+\\.)+"), _ret(ACRONYM, 1)),
        (_c(f"{_ALPHA}[&@]{_ALPHA}"), _ret(COMPANY, 1)),
        (_c(f"{_AN}(?:[-._]{_AN})*@{_AN}(?:[-.]{_AN})+"), _ret(EMAIL, 1)),
        (_c(_NUM), _ret(NUM, 1)),
        (_c(_HOST_RE), _ret(HOST, 1)),
        (_c(f"[{_CJ}]"), _ret(CJ, 1)),
        (_c(r"\[\[:?Category:"), _enter(_CAT, CATEGORY)),
        (_c(r"\[\["), _enter(_ILINK, INTERNAL_LINK)),
        (_c(r"\["), _enter(_ELINK, EXTERNAL_LINK_URL)),
        (_c("''"), _two_quotes),
        (_c("=="), _enter(_DEQ)),
        (_c(r"\{\{[Ii]nfobox_"), _ignore_init),
        (_c(r"\{\{"), _enter(_DBRACE, CITATION)),
        (_c("<ref>"), _enter(_DBRACE, CITATION)),
        (_c(_WS), _ignore_init),
        (_c(r"(?s)."), _ignore_init),
        (_c(_TAGS), _ignore),  # unprefixed catchall, lowest priority
    ],
    _ILINK: [
        (_c(_AN), _wiki_word),
        (_c(r"\]\]"), _close_ilink),
        (_c(_WS), _ignore_posinc1),
        (_c(r"(?s)."), _ignore_posinc1),
        (_c(_TAGS), _ignore),
    ],
    _ELINK: [
        (_c(_URL), _elink_url),
        (_c(_AN), _elink_word),
        (_c(r"\]"), _close_elink),
        (_c(_WS), _ignore_posinc1),
    ] + _CATCHALL,
    _CAT: [
        (_c(_AN), _wiki_word),
        (_c(r"\]\]"), _to_initial),
        (_c(_WS), _ignore_posinc1),
        (_c(r"(?s)."), _ignore_posinc1),
        (_c(_TAGS), _ignore),
    ],
    _TWOQ: [
        (_c("'"), _enter(_THREEQ, BOLD, reset_seen=False,
                         set_posinc=False)),
        (_c("'''"), _enter(_FIVEQ, BOLD_ITALICS, reset_seen=False,
                           set_posinc=False)),
        (_c(_AN), _quote_word(ITALICS)),
        *_link_overrides(),
        (_c(_WS), _ignore),
        (_c(r"(?s)."), _ignore),
        (_c(_TAGS), _ignore),
    ],
    _THREEQ: [
        (_c(_AN), _quote_word()),
        *_link_overrides(),
        (_c(_WS), _ignore),
        (_c(r"(?s)."), _ignore),
        (_c(_TAGS), _ignore),
    ],
    _FIVEQ: [
        (_c(_AN), _quote_word()),
        *_link_overrides(),
        (_c(_WS), _ignore),
        (_c(r"(?s)."), _ignore),
        (_c(_TAGS), _ignore),
    ],
    _DEQ: [
        (_c("=="), _to_initial),
        (_c("="), _deq_sub),
        (_c(_AN), _deq_word),
        (_c(_WS), _ignore),
        (_c(r"(?s)."), _ignore),
        (_c(_TAGS), _ignore),
    ],
    _DBRACE: [
        (_c(_AN), _brace_word),
        (_c(r"\}\}"), _to_initial),
        (_c("</ref>"), _to_initial),
        (_c(_WS), _ignore),
        (_c(r"(?s)."), _ignore),
        (_c(_TAGS), _ignore),
    ],
    _STR: [
        (_c("'''''"), _str_end),
        (_c("'''"), _str_end),
        (_c("''"), _str_end),
        (_c("==="), _str_end),
        (_c(_AN), _str_word),
        *_link_overrides(reset_balanced=True),
        (_c(r"\|"), _str_pipe),
        (_c(_WS), _ignore),
        (_c(r"(?s)."), _ignore),
        (_c(_TAGS), _ignore),
    ],
}

def wikipedia_tokenize(text: str, token_output: int = TOKENS_ONLY,
                       untokenized_types: frozenset = frozenset()
                       ) -> list[WikiToken]:
    """Tokenize wiki markup -> [WikiToken(term, type, pos_inc, start,
    end, flags)].  ``untokenized_types`` uses the string type names
    ("c", "il", "b", ...) like the reference."""
    sc = _Scanner(text)
    out: list[WikiToken] = []
    first = True

    pending = None  # one-token lookahead for collapse pushback

    def nxt():
        nonlocal pending
        if pending is not None:
            t, pending = pending, None
            return t
        return sc.next_token()

    while True:
        t = nxt()
        if t is None:
            break
        tok_id, term, start = t
        type_name = TOKEN_TYPES[tok_id]
        collapse = (token_output != TOKENS_ONLY
                    and type_name in untokenized_types)
        if not collapse:
            inc = sc.position_inc
            if first and inc == 0:
                inc = 1
            out.append(WikiToken(term, type_name, inc, start,
                                 start + len(term)))
            first = False
            continue

        # collapseTokens / collapseAndSaveTokens
        buf = term
        the_start = start
        last_pos = start + len(term)
        num_seen = 0
        individual = [WikiToken(term, type_name, 0, start,
                                start + len(term))]
        while True:
            t2 = sc.next_token()
            if t2 is None:
                break
            if t2[0] != tok_id or sc.num_wiki_seen <= num_seen:
                pending = t2
                break
            curr_pos = t2[2]
            buf += " " * (curr_pos - last_pos) + t2[1]
            individual.append(WikiToken(t2[1], type_name,
                                        sc.position_inc, curr_pos,
                                        curr_pos + len(t2[1])))
            num_seen += 1
            last_pos = curr_pos + len(t2[1])
        s = buf.strip()
        inc = sc.position_inc  # scanner state after the lookahead,
        if first and inc == 0:  # exactly as incrementToken reads it
            inc = 1
        collapsed = WikiToken(s, type_name, inc, the_start,
                              the_start + len(s),
                              UNTOKENIZED_TOKEN_FLAG)
        out.append(collapsed)
        first = False
        if token_output == BOTH:
            out.extend(individual)
    return out
