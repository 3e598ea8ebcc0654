"""Polish analysis — stempel (Egothor trie stemmer) engine.

Re-derivation of the reference's stempel module
(``lucene/analysis/stempel/src/java/org/egothor/stemmer/`` +
``org/apache/lucene/analysis/{stempel,pl}/``):

  * the Egothor patch-command interpreter ``Diff.apply``
    (``Diff.java:41-86``) — command pairs ``-x Rx Dx Ix`` walked right
    to left with the reference's silent stop on out-of-bounds;
  * ``Trie`` / ``MultiTrie2`` lookup (``Trie.java:228-295``,
    ``MultiTrie2.java:98-175``) including the reversed ``StrEnum``
    order, the ``cannotFollow`` / ``lengthPP`` / key-skip rules, and
    EOM ``*`` termination;
  * the Java ``DataInput`` deserializer for trained ``.tbl`` tables
    (``Trie.java:85``, ``Row.java:78``, ``MultiTrie.java:83``,
    ``StempelStemmer.load``): readBoolean/readInt/readChar/readUTF;
  * ``StempelStemmer.stem`` (null command / empty result -> None) and
    ``StempelFilter``'s min-length-3 guard (stem only terms LONGER
    than 3 chars; keep the original on a null stem);
  * ``PolishAnalyzer`` chain: standard -> lower -> stop(pl 182,
    carrot2 list shipped by the reference) -> stempel.

The TRAINED table (``stemmer_20000.tbl``) is data, not code — the
engine loads it from ``table_path``/``table_bytes`` when supplied (the
reference checkout's copy is picked up automatically when present, and
the test suite validates against it); without a table the chain indexes
unstemmed lowercase terms, and any Egothor-trained table for any
language drops in.
"""

from __future__ import annotations

import os
import struct

from .tokenizer import Token, standard_tokenize

__all__ = ["POLISH_STOP_WORDS", "DiffApply", "load_stemmer",
           "StempelStemmer", "polish_analyze", "make_polish_analyzer",
           "REFERENCE_TABLE"]

REFERENCE_TABLE = ("/root/reference/lucene/analysis/stempel/src/resources/"
                   "org/apache/lucene/analysis/pl/stemmer_20000.tbl")

POLISH_STOP_WORDS = frozenset("""
vol o.o. mgr godz zł www pl ul tel hab prof inż dr i u aby albo ale
ani aż bardzo bez bo bowiem by byli bym był była było były być
będzie będą chce choć co coraz coś czy czyli często dla do gdy
gdyby gdyż gdzie go ich im inne iż ja jak jakie jako je jednak
jednym jedynie jego jej jest jeszcze jeśli jeżeli już ją kiedy
kilku kto która które którego której który których którym
którzy lat lecz lub ma mają mamy mi miał mimo mnie mogą może
można mu musi na nad nam nas nawet nic nich nie niej nim niż no
nowe np nr o od ok on one oraz pan po pod ponad ponieważ poza przed
przede przez przy raz razie roku również się sobie sposób swoje
są ta tak takich takie także tam te tego tej temu ten teraz też to
trzeba tu tych tylko tym tys tzw tę w we wie więc wszystko wśród
właśnie z za zaś ze że żeby ii iii iv vi vii viii ix xi xii xiii
xiv xv
""".split())


# ---------------------------------------------------------------------------
# Java DataInput reader
# ---------------------------------------------------------------------------

class _DataInput:
    def __init__(self, data: bytes):
        self.b = data
        self.i = 0

    def read_boolean(self) -> bool:
        v = self.b[self.i] != 0
        self.i += 1
        return v

    def read_int(self) -> int:
        v = struct.unpack_from(">i", self.b, self.i)[0]
        self.i += 4
        return v

    def read_char(self) -> str:
        v = struct.unpack_from(">H", self.b, self.i)[0]
        self.i += 2
        return chr(v)

    def read_utf(self) -> str:
        n = struct.unpack_from(">H", self.b, self.i)[0]
        self.i += 2
        raw = self.b[self.i:self.i + n]
        self.i += n
        # modified UTF-8: decode per Java rules (no 4-byte forms)
        out, j = [], 0
        while j < n:
            c = raw[j]
            if c < 0x80:
                out.append(chr(c))
                j += 1
            elif c >> 5 == 0b110:
                out.append(chr(((c & 0x1F) << 6) | (raw[j + 1] & 0x3F)))
                j += 2
            else:
                out.append(chr(((c & 0x0F) << 12)
                               | ((raw[j + 1] & 0x3F) << 6)
                               | (raw[j + 2] & 0x3F)))
                j += 3
        return "".join(out)


# ---------------------------------------------------------------------------
# Diff.apply
# ---------------------------------------------------------------------------

def DiffApply(dest: list[str], diff: str | None) -> None:
    """Apply an Egothor patch to ``dest`` (list of chars, mutated) —
    Diff.java:41-86 including the silent stop on out-of-bounds."""
    if diff is None:
        return
    pos = len(dest) - 1
    if pos < 0:
        return
    try:
        for i in range(len(diff) // 2):
            cmd = diff[2 * i]
            param = diff[2 * i + 1]
            par_num = ord(param) - ord("a") + 1
            if cmd == "-":
                pos = pos - par_num + 1
            elif cmd == "R":
                if pos < 0 or pos >= len(dest):
                    raise IndexError
                dest[pos] = param
            elif cmd == "D":
                o = pos
                pos -= par_num - 1
                if pos < 0 or pos > len(dest):
                    raise IndexError
                del dest[pos:o + 1]
            elif cmd == "I":
                pos += 1
                if pos < 0 or pos > len(dest):
                    raise IndexError
                dest.insert(pos, param)
            pos -= 1
    except IndexError:
        pass  # reference catches and keeps the partial result


# ---------------------------------------------------------------------------
# Trie / MultiTrie2
# ---------------------------------------------------------------------------

class _Trie:
    def __init__(self, di: _DataInput):
        self.forward = di.read_boolean()
        self.root = di.read_int()
        self.cmds = [di.read_utf() for _ in range(di.read_int())]
        self.rows = [self._read_row(di) for _ in range(di.read_int())]

    @staticmethod
    def _read_row(di: _DataInput) -> dict:
        cells = {}
        for _ in range(di.read_int()):
            ch = di.read_char()
            cells[ch] = (di.read_int(), di.read_int(), di.read_int(),
                         di.read_int())  # cmd, cnt, ref, skip
        return cells

    def _enum(self, key: str):
        return iter(key) if self.forward else iter(reversed(key))

    def get_last_on_path(self, key: str) -> str | None:
        if not key:
            return None
        now = self.rows[self.root]
        last = None
        e = self._enum(key)
        for _ in range(len(key) - 1):
            ch = next(e)
            cell = now.get(ch)
            if cell is None:
                return last
            if cell[0] >= 0:
                last = self.cmds[cell[0]]
            ref = cell[2]
            if 0 <= ref < len(self.rows):
                now = self.rows[ref]
            else:
                return last
        cell = now.get(next(e))
        return self.cmds[cell[0]] if cell is not None and cell[0] >= 0 \
            else last


_EOM = "*"


class _MultiTrie2:
    def __init__(self, di: _DataInput):
        self.forward = di.read_boolean()
        self.by = di.read_int()
        self.tries = [_Trie(di) for _ in range(di.read_int())]

    def _skip(self, s: str, count: int) -> str:
        return s[count:] if self.forward else s[:len(s) - count]

    @staticmethod
    def _length_pp(cmd: str) -> int:
        ln, i = 0, 0
        while i < len(cmd):
            c = cmd[i]
            i += 1
            if c in "-D":
                ln += ord(cmd[i]) - ord("a") + 1
            elif c == "R":
                ln += 1
            i += 1
        return ln

    @staticmethod
    def _cannot_follow(after: str, goes: str) -> bool:
        return after in "-D" and after == goes

    def get_last_on_path(self, key: str) -> str:
        result = []
        try:
            lastkey = key
            prev = None
            lastch = " "
            for trie in self.tries:
                r = trie.get_last_on_path(lastkey)
                if r is None or (len(r) == 1 and r[0] == _EOM):
                    return "".join(result)
                if self._cannot_follow(lastch, r[0]):
                    return "".join(result)
                if len(r) < 2:
                    raise IndexError
                lastch = r[-2]
                if r[0] == "-":
                    if prev is not None:
                        key = self._skip(key, self._length_pp(prev))
                    key = self._skip(key, self._length_pp(r))
                prev = r
                result.append(r)
                if key:
                    lastkey = key
        except IndexError:
            pass
        return "".join(result)


class StempelStemmer:
    """StempelStemmer.java — stem via the trained trie's patch commands."""

    def __init__(self, trie):
        self.trie = trie

    def stem(self, word: str) -> str | None:
        cmd = self.trie.get_last_on_path(word)
        if not cmd:
            return None
        buf = list(word)
        DiffApply(buf, cmd)
        return "".join(buf) if buf else None


def load_stemmer(table_bytes: bytes | None = None,
                 table_path: str | None = None) -> StempelStemmer | None:
    """StempelStemmer.load: readUTF method flag -> MultiTrie2 when it
    contains 'M', else a single Trie.  Returns None when no table is
    available."""
    if table_bytes is None:
        path = table_path or REFERENCE_TABLE
        if not os.path.exists(path):
            return None
        with open(path, "rb") as f:
            table_bytes = f.read()
    di = _DataInput(table_bytes)
    method = di.read_utf()
    trie = _MultiTrie2(di) if "M" in method else _Trie(di)
    return StempelStemmer(trie)


# ---------------------------------------------------------------------------
# PolishAnalyzer chain
# ---------------------------------------------------------------------------

_DEFAULT: list = [None]  # lazy singleton; [stemmer-or-None]
_LOADED = [False]


def _default_stemmer() -> StempelStemmer | None:
    if not _LOADED[0]:
        _DEFAULT[0] = load_stemmer()
        _LOADED[0] = True
    return _DEFAULT[0]


_USE_DEFAULT = object()


def polish_analyze(text: str, stemmer=_USE_DEFAULT) -> list[Token]:
    """PolishAnalyzer chain: standard -> lower -> stop(pl) ->
    StempelFilter (terms longer than 3 chars; original kept on a null
    stem).  ``stemmer=None`` disables stemming explicitly; by default
    the reference table is loaded when present."""
    st = _default_stemmer() if stemmer is _USE_DEFAULT else stemmer
    out: list[Token] = []
    for term, pos, start, end in standard_tokenize(text):
        t = term.lower()
        if t in POLISH_STOP_WORDS:
            continue
        if st is not None and len(t) > 3:
            s = st.stem(t)
            if s is not None:
                t = s
        out.append(Token(t, pos, start, end))
    return out


def make_polish_analyzer(table_bytes: bytes | None = None,
                         table_path: str | None = None):
    st = load_stemmer(table_bytes, table_path)

    def _chain(text: str) -> list[Token]:
        return polish_analyze(text, stemmer=st)
    return _chain


def _register():
    from .tokenizer import register_analyzer

    register_analyzer("polish", polish_analyze)


_register()
