"""Beider-Morse engine: reference fixtures + a bit-exact diff against
the REAL commons-codec PhoneticEngine running in the SparkSession's JVM
(the same jar whose rule resources the Python engine loads), mirroring
``TestBeiderMorseFilter.java`` and ``commons-codec``'s own bm tests."""

import pytest

from lucene_solr_old_spark.functions.beidermorse import (
    ANY, BeiderMorseEngine, bm_expand, guess_languages)


# --- TestBeiderMorseFilter.java fixtures (generic/exact/concat) ---------

@pytest.fixture(scope="module")
def exact():
    return BeiderMorseEngine("gen", "exact", True)


def test_basic_usage(exact):
    assert bm_expand("Angelo", exact) == [
        "anZelo", "andZelo", "angelo", "anhelo", "anjelo", "anxelo"]
    assert bm_expand("D'Angelo", exact) == [
        "anZelo", "andZelo", "angelo", "anhelo", "anjelo", "anxelo",
        "danZelo", "dandZelo", "dangelo", "danhelo", "danjelo", "danxelo"]


def test_language_set(exact):
    assert bm_expand("Angelo", exact,
                     languages={"italian", "greek", "spanish"}) == [
        "andZelo", "angelo", "anxelo"]


def test_numbers_pass_through(exact):
    # no phonemes -> original term passes through (filter convenience)
    assert exact.encode("1234") == ""
    assert bm_expand("1234", exact) == ["1234"]


def test_empty_term(exact):
    assert bm_expand("", exact) == [""]


def test_approx_differs_from_exact():
    approx = BeiderMorseEngine("gen", "approx", True)
    exact = BeiderMorseEngine("gen", "exact", True)
    assert approx.encode("Angelo") != exact.encode("Angelo")
    assert approx.encode("Angelo")


def test_bad_config():
    with pytest.raises(ValueError):
        BeiderMorseEngine("nope")
    with pytest.raises(ValueError):
        BeiderMorseEngine("gen", "fuzzy")


def test_guess_languages():
    # lang.txt sanity: -ault is French-accepting, tsch German-accepting
    gl = guess_languages("gen", "renault")
    assert gl is not ANY and "french" in gl
    gd = guess_languages("gen", "tschüss")
    assert gd is not ANY and "german" in gd


# --- bit-exact oracle: the JVM PhoneticEngine through py4j --------------

NAMES = [
    "Washington", "Kennedy", "Schmidt", "Müller", "Kowalski", "Cohen",
    "ben Haim", "O'Brien", "de la Cruz", "van Helsing", "D'Angelo",
    "Beider", "Morse", "Tchaikovsky", "Szczepanski", "Nguyen", "García",
    "Ōta", "Renault", "McDonald", "Fitzgerald", "Johansson", "Ivanov",
    "Papadopoulos", "Rossi", "Silva", "dos Santos", "Öztürk", "Takács",
    "Wojciechowski", "Christodoulou", "Fernández", "Yilmaz", "Horowitz",
    "Rabinowitz", "del Rio", "Auerbach", "Lefèvre", "czarnecki",
    "x", "", "ab", "Ha'Levi", "bar Kochba", "qqq", "grzegorz",
]


def _jvm_engine(spark, nt, rt, concat):
    jvm = spark.sparkContext._jvm
    NameType = jvm.org.apache.commons.codec.language.bm.NameType
    RuleType = jvm.org.apache.commons.codec.language.bm.RuleType
    Engine = jvm.org.apache.commons.codec.language.bm.PhoneticEngine
    nt_j = {"gen": NameType.GENERIC, "ash": NameType.ASHKENAZI,
            "sep": NameType.SEPHARDIC}[nt]
    rt_j = {"approx": RuleType.APPROX, "exact": RuleType.EXACT}[rt]
    return Engine(nt_j, rt_j, concat)


@pytest.mark.parametrize("nt,rt", [
    ("gen", "exact"), ("gen", "approx"),
    ("ash", "exact"), ("ash", "approx"),
    ("sep", "approx"),
])
def test_bit_exact_vs_jvm(spark, nt, rt):
    jeng = _jvm_engine(spark, nt, rt, True)
    peng = BeiderMorseEngine(nt, rt, True)
    for name in NAMES:
        assert peng.encode(name) == jeng.encode(name), (nt, rt, name)


def test_bit_exact_vs_jvm_nonconcat(spark):
    jeng = _jvm_engine(spark, "gen", "approx", False)
    peng = BeiderMorseEngine("gen", "approx", False)
    for name in NAMES:
        assert peng.encode(name) == jeng.encode(name), name


def test_bit_exact_vs_jvm_random(spark):
    """Fuzz: random ASCII-ish name-like strings, engine vs JVM."""
    import random

    rng = random.Random(42)
    alpha = "abcdefghijklmnopqrstuvwxyz'äöüßéèàçñ "
    jeng = _jvm_engine(spark, "gen", "approx", True)
    peng = BeiderMorseEngine("gen", "approx", True)
    for _ in range(300):
        w = "".join(rng.choice(alpha)
                    for _ in range(rng.randint(1, 12))).strip()
        assert peng.encode(w) == jeng.encode(w), repr(w)


def test_prefix_order_matches_jvm(spark):
    """Multi-prefix inputs ('de la X' matches both 'de' and 'de la'):
    the frozen Java-HashSet iteration order must pick the same one."""
    jeng = _jvm_engine(spark, "gen", "exact", True)
    peng = BeiderMorseEngine("gen", "exact", True)
    for name in ["de la Cruz", "del Rio", "de Santos", "dela Torre",
                 "van der Berg", "della Robbia", "dos Reis"]:
        assert peng.encode(name) == jeng.encode(name), name
