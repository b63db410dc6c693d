"""P8 snowball stemmer parity: the reference's stemmer_filter_test.go
fixtures (en + ru) plus classic snowball sample-vocabulary checks, through
both the pure-Python kernel and the Spark pandas-UDF column op."""

from pyspark.sql import functions as F

from suggest_spark.functions.stemmer import (
    porter2_stem,
    russian_stem,
    snowball_stem_filter,
    stem_filter_py,
)

# /root/reference/pkg/analysis/stemmer_filter_test.go:11-36 (ru), :38-63 (en)
RU_GOLDENS = [
    (
        "вместе с тем о силе электромагнитной энергии имели представление еще",
        ["вмест", "сил", "электромагнитн", "энерг", "имел", "представлен"],
    ),
    ("total 2310 рублей итого", ["total", "2310", "рубл", "ит"]),
]
EN_GOLDENS = [
    ("What does борщ mean", ["What", "борщ", "mean"]),
    ("Hello hello mister Credo What's up", ["Hello", "hello", "mister", "Credo", "What"]),
]

#: snowballstem.org public sample vocabulary excerpts
EN_VOCAB = {
    "consign": "consign", "consigned": "consign", "consigning": "consign",
    "consignment": "consign", "consolation": "consol", "knavery": "knaveri",
    "generate": "generat", "generation": "generat", "general": "general",
    "generically": "generic", "hopping": "hop", "hoping": "hope",
    "happy": "happi", "tied": "tie", "ties": "tie", "cry": "cri",
    "by": "by", "say": "say", "national": "nation", "rational": "ration",
    "agreed": "agre", "feed": "feed", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "falling": "fall",
    "fizzed": "fizz", "failing": "fail", "filing": "file",
    "communism": "communism", "communities": "communiti",
    "arguing": "argu", "argument": "argument", "dying": "die",
    "skies": "sky", "sky": "sky", "news": "news", "proceed": "proceed",
    "inning": "inning", "herring": "herring",  # exception2 invariants
}
RU_VOCAB = {
    "книги": "книг", "книгой": "книг", "важная": "важн",
    "важной": "важн", "читая": "чит", "прочитав": "прочита",
    "бежавший": "бежа", "красивейший": "красив", "делание": "делан",
    "умывается": "умыва",
}


def test_en_goldens_py():
    for sentence, want in EN_GOLDENS:
        assert stem_filter_py(sentence.split(" "), "en") == want


def test_ru_goldens_py():
    for sentence, want in RU_GOLDENS:
        assert stem_filter_py(sentence.split(" "), "ru") == want


def test_en_sample_vocabulary():
    bad = {w: porter2_stem(w) for w, s in EN_VOCAB.items() if porter2_stem(w) != s}
    assert not bad, bad


def test_ru_sample_vocabulary():
    bad = {w: russian_stem(w) for w, s in RU_VOCAB.items() if russian_stem(w) != s}
    assert not bad, bad


def test_exception2_applies_after_step1a():
    # "earrings" loses its plural s in step 1a and THEN hits the earring
    # invariant; "winnings" → "winning" is not a member → stems to "win"
    assert porter2_stem("earrings") == "earring"
    assert porter2_stem("winnings") == "win"


def test_stemmers_total_and_deterministic():
    """Property sweep (no Spark): both stemmers are total functions —
    no exceptions on arbitrary text — and deterministic."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=24))
    def _en(w):
        assert porter2_stem(w) == porter2_stem(w)

    @settings(max_examples=300, deadline=None)
    @given(
        st.text(
            alphabet=st.characters(
                whitelist_categories=("Ll", "Lu"), whitelist_characters="ё'-"
            ),
            max_size=24,
        )
    )
    def _ru(w):
        assert russian_stem(w) == russian_stem(w)

    _en()
    _ru()


def test_stemmer_never_lengthens_beyond_one():
    """Porter2 can re-add a single 'e' after suffix removal but never grows
    a word: len(stem) <= len(word) for words without a leading apostrophe."""
    import random
    import string

    rng = random.Random(11)
    for _ in range(2000):
        w = "".join(rng.choice(string.ascii_lowercase + "'") for _ in range(rng.randint(1, 14)))
        w = w.lstrip("'")
        assert len(porter2_stem(w)) <= max(len(w), 2), w


def test_spark_column_matches_python(spark):
    sentences = [s for s, _ in EN_GOLDENS] + ["Generation of generically sized arguments"]
    df = spark.createDataFrame(
        [(i, s.split(" ")) for i, s in enumerate(sentences)],
        "id long, words array<string>",
    )
    out = df.select("id", snowball_stem_filter(F.col("words"), "en").alias("stems"))
    got = {r["id"]: r["stems"] for r in out.collect()}
    for i, s in enumerate(sentences):
        assert got[i] == stem_filter_py(s.split(" "), "en")

    ru_df = spark.createDataFrame(
        [(i, s.split(" ")) for i, (s, _) in enumerate(RU_GOLDENS)],
        "id long, words array<string>",
    )
    out_ru = ru_df.select("id", snowball_stem_filter(F.col("words"), "ru").alias("stems"))
    got_ru = {r["id"]: r["stems"] for r in out_ru.collect()}
    for i, (s, want) in enumerate(RU_GOLDENS):
        assert got_ru[i] == want
