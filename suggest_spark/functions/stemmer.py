"""Snowball stemmers (English Porter2 + Russian), pure Python, implemented
from the public algorithm specifications at snowballstem.org (Snowball
2.0.0 semantics — the same generator version as the reference's embedded
data, /root/reference/pkg/analysis/{en,ru}/algorithm.go headers).

This completes P8 (stop-word + stemmer filter, reference
pkg/analysis/stemmer_filter.go:17-49): the filter drops stop words (checked
BEFORE stemming, case-sensitive membership as the reference does) and stems
the survivors.  The stop word lists are the standard snowball stop.txt
lists (public data, cited by the reference's stop_words.go headers).

Spark form: an Arrow-batched pandas UDF over ``array<string>`` token
columns — stemming is per-token pure CPU with no joins, so a vectorized
Python kernel is the right physical shape (there is no Catalyst built-in);
the UDF is applied AFTER tokenization, off every hot path (the suggest
chain never wires it, matching the reference).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

# ---------------------------------------------------------------------------
# English (Porter2)
# ---------------------------------------------------------------------------

_EN_VOWELS = frozenset("aeiouy")
_EN_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_EN_LI_ENDING = frozenset("cdeghkmnrt")

_EN_EXCEPTION1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_EN_EXCEPTION2 = frozenset(
    ["inning", "outing", "canning", "herring", "earring",
     "proceed", "exceed", "succeed"]
)

_EN_STEP2 = [  # longest-match order; (suffix, replacement or callable)
    ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
    ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
    ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
    ("ation", "ate"), ("alism", "al"), ("aliti", "al"), ("ousli", "ous"),
    ("iviti", "ive"), ("fulli", "ful"), ("enci", "ence"), ("anci", "ance"),
    ("abli", "able"), ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
    ("bli", "ble"), ("ogi", None), ("li", None),
]
_EN_STEP3 = [
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ative", None), ("ical", "ic"),
    ("ness", ""), ("ful", ""),
]
_EN_STEP4 = [
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
    "ion", "al", "er", "ic",
]


def _en_regions(word: str) -> tuple[int, int]:
    r1 = len(word)
    for pre in ("gener", "commun", "arsen"):
        if word.startswith(pre):
            r1 = len(pre)
            break
    else:
        for i in range(1, len(word)):
            if word[i] not in _EN_VOWELS and word[i - 1] in _EN_VOWELS:
                r1 = i + 1
                break
    r2 = len(word)
    for i in range(r1 + 1, len(word)):
        if word[i] not in _EN_VOWELS and word[i - 1] in _EN_VOWELS:
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(word: str) -> bool:
    if len(word) == 2:
        return word[0] in _EN_VOWELS and word[1] not in _EN_VOWELS
    if len(word) >= 3:
        return (
            word[-2] in _EN_VOWELS
            and word[-1] not in _EN_VOWELS
            and word[-1] not in "wxY"
            and word[-3] not in _EN_VOWELS
        )
    return False


def porter2_stem(word: str) -> str:
    """Porter2 ("english") snowball stemmer, Snowball 2.0.0 semantics."""
    if word in _EN_EXCEPTION1:
        return _EN_EXCEPTION1[word]
    if len(word) <= 2:
        return word
    # prelude: strip a leading apostrophe; mark consonant y as Y
    if word.startswith("'"):
        word = word[1:]
        if word in _EN_EXCEPTION1:
            return _EN_EXCEPTION1[word]
        if len(word) <= 2:
            return word
    chars = list(word)
    if chars and chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _EN_VOWELS:
            chars[i] = "Y"
    word = "".join(chars)
    r1, r2 = _en_regions(word)

    def in_r1(suffix: str) -> bool:
        return len(word) - len(suffix) >= r1

    def in_r2(suffix: str) -> bool:
        return len(word) - len(suffix) >= r2

    # step 0
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break
    # step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith("ied") or word.endswith("ies"):
        word = word[:-2] if len(word) > 4 else word[:-1]
    elif word.endswith(("us", "ss")):
        pass
    elif word.endswith("s"):
        if any(c in _EN_VOWELS for c in word[:-2]):
            word = word[:-1]
    if word in _EN_EXCEPTION2:
        return word
    # step 1b
    ext = None
    for suf, b in (("eedly", 1), ("ingly", 2), ("edly", 2), ("eed", 1),
                   ("ing", 2), ("ed", 2)):
        if word.endswith(suf):
            ext = (suf, b)
            break
    if ext is not None:
        suf, b = ext
        if b == 1:
            if in_r1(suf):
                word = word[: -len(suf)] + "ee"
        else:
            stem_part = word[: -len(suf)]
            if any(c in _EN_VOWELS for c in stem_part):
                word = stem_part
                if word.endswith(("at", "bl", "iz")):
                    word += "e"
                elif word.endswith(_EN_DOUBLES):
                    word = word[:-1]
                elif r1 >= len(word) and _ends_short_syllable(word):
                    word += "e"
                r1, r2 = _en_regions(word)  # regions shift only via length
    # step 1c
    if (
        len(word) > 2
        and word[-1] in ("y", "Y")
        and word[-2] not in _EN_VOWELS
    ):
        word = word[:-1] + "i"
    # step 2
    for suf, repl in _EN_STEP2:
        if word.endswith(suf):
            if in_r1(suf):
                if suf == "ogi":
                    if word.endswith("logi"):
                        word = word[:-1]
                elif suf == "li":
                    if len(word) > 2 and word[-3] in _EN_LI_ENDING:
                        word = word[:-2]
                else:
                    word = word[: -len(suf)] + repl
            break
    # step 3
    for suf, repl in _EN_STEP3:
        if word.endswith(suf):
            if in_r1(suf):
                if suf == "ative":
                    if in_r2(suf):
                        word = word[: -len(suf)]
                else:
                    word = word[: -len(suf)] + repl
            break
    # step 4
    for suf in _EN_STEP4:
        if word.endswith(suf):
            if in_r2(suf):
                if suf == "ion":
                    if len(word) > 3 and word[-4] in ("s", "t"):
                        word = word[:-3]
                else:
                    word = word[: -len(suf)]
            break
    # step 5
    if word.endswith("e"):
        if in_r2("e") or (in_r1("e") and not _ends_short_syllable(word[:-1])):
            word = word[:-1]
    elif word.endswith("l"):
        if in_r2("l") and len(word) > 1 and word[-2] == "l":
            word = word[:-1]
    return word.replace("Y", "y")


# ---------------------------------------------------------------------------
# Russian
# ---------------------------------------------------------------------------

_RU_VOWELS = frozenset("аеиоуыэюя")

# group-1 endings require a preceding а/я (which is kept)
_RU_PERFECTIVE_1 = ("вшись", "вши", "в")
_RU_PERFECTIVE_2 = ("ившись", "ывшись", "ивши", "ывши", "ив", "ыв")
_RU_REFLEXIVE = ("ся", "сь")
_RU_ADJECTIVE = (
    "ими", "ыми", "его", "ого", "ему", "ому", "ее", "ие", "ые", "ое",
    "ей", "ий", "ый", "ой", "ем", "им", "ым", "ом", "их", "ых",
    "ую", "юю", "ая", "яя", "ою", "ею",
)
_RU_PARTICIPLE_1 = ("ем", "нн", "вш", "ющ", "щ")
_RU_PARTICIPLE_2 = ("ивш", "ывш", "ующ")
_RU_VERB_1 = (
    "ете", "йте", "ешь", "нно", "ла", "на", "ли", "ем", "ло", "но",
    "ет", "ют", "ны", "ть", "й", "л", "н",
)
_RU_VERB_2 = (
    "ейте", "уйте", "ила", "ыла", "ена", "ите", "или", "ыли", "ило",
    "ыло", "ено", "ует", "уют", "ены", "ить", "ыть", "ишь", "ую",
    "ей", "уй", "ил", "ыл", "им", "ым", "ен", "ят", "ит", "ыт", "ю",
)
_RU_NOUN = (
    "иями", "ями", "ами", "ией", "иям", "ием", "иях", "ев", "ов",
    "ие", "ье", "еи", "ии", "ей", "ой", "ий", "ям", "ем", "ам", "ом",
    "ах", "ях", "ию", "ью", "ия", "ья", "а", "е", "и", "й", "о", "у",
    "ы", "ь", "ю", "я",
)
_RU_DERIVATIONAL = ("ость", "ост")
_RU_SUPERLATIVE = ("ейше", "ейш")


def _ru_regions(word: str) -> tuple[int, int]:
    """(rv, r2) start indices."""
    rv = len(word)
    for i, c in enumerate(word):
        if c in _RU_VOWELS:
            rv = i + 1
            break
    r1 = len(word)
    for i in range(1, len(word)):
        if word[i] not in _RU_VOWELS and word[i - 1] in _RU_VOWELS:
            r1 = i + 1
            break
    r2 = len(word)
    for i in range(r1 + 1, len(word)):
        if word[i] not in _RU_VOWELS and word[i - 1] in _RU_VOWELS:
            r2 = i + 1
            break
    return rv, r2


def _ru_try(word: str, rv: int, suffixes: tuple[str, ...], group1: bool = False):
    """Longest suffix (list pre-sorted longest-first) ending in RV; group-1
    suffixes additionally require a preceding а/я inside RV.  Returns the
    shortened word or None."""
    for suf in suffixes:
        if word.endswith(suf) and len(word) - len(suf) >= rv:
            if group1:
                p = len(word) - len(suf) - 1
                if p < rv or p < 0 or word[p] not in ("а", "я"):
                    continue
            return word[: -len(suf)]
    return None


def russian_stem(word: str) -> str:
    """Snowball "russian" stemmer, Snowball 2.0.0 semantics."""
    word = word.replace("ё", "е")
    rv, r2 = _ru_regions(word)

    # step 1: perfective gerund, else [reflexive] + adjectival/verb/noun
    res = _ru_try(word, rv, _RU_PERFECTIVE_2) or _ru_try(
        word, rv, _RU_PERFECTIVE_1, group1=True
    )
    if res is not None:
        word = res
    else:
        res = _ru_try(word, rv, _RU_REFLEXIVE)
        if res is not None:
            word = res
        adj = _ru_try(word, rv, _RU_ADJECTIVE)
        if adj is not None:
            word = adj
            part = _ru_try(word, rv, _RU_PARTICIPLE_2) or _ru_try(
                word, rv, _RU_PARTICIPLE_1, group1=True
            )
            if part is not None:
                word = part
        else:
            res = _ru_try(word, rv, _RU_VERB_2) or _ru_try(
                word, rv, _RU_VERB_1, group1=True
            )
            if res is not None:
                word = res
            else:
                res = _ru_try(word, rv, _RU_NOUN)
                if res is not None:
                    word = res
    # step 2: drop a trailing и
    res = _ru_try(word, rv, ("и",))
    if res is not None:
        word = res
    # step 3: derivational (must be in R2)
    for suf in _RU_DERIVATIONAL:
        if word.endswith(suf) and len(word) - len(suf) >= max(rv, r2):
            word = word[: -len(suf)]
            break
    # step 4: superlative / undouble нн / drop ь
    res = _ru_try(word, rv, _RU_SUPERLATIVE)
    if res is not None:
        word = res
        if word.endswith("нн") and len(word) - 1 >= rv:
            word = word[:-1]
    elif word.endswith("нн") and len(word) - 1 >= rv:
        word = word[:-1]
    elif word.endswith("ь") and len(word) - 1 >= rv:
        word = word[:-1]
    return word


# ---------------------------------------------------------------------------
# filter (reference stemmer_filter.go:33-49 semantics)
# ---------------------------------------------------------------------------

EN_STOP_WORDS = frozenset(
    """i me my myself we our ours ourselves you your yours yourself yourselves
    he him his himself she her hers herself it its itself they them their
    theirs themselves what which who whom this that these those am is are was
    were be been being have has had having do does did doing would should
    could ought i'm you're he's she's it's we're they're i've you've we've
    they've i'd you'd he'd she'd we'd they'd i'll you'll he'll she'll we'll
    they'll isn't aren't wasn't weren't hasn't haven't hadn't doesn't don't
    didn't won't wouldn't shan't shouldn't can't cannot couldn't mustn't
    let's that's who's what's here's there's when's where's why's how's a an
    the and but if or because as until while of at by for with about against
    between into through during before after above below to from up down in
    out on off over under again further then once here there when where why
    how all any both each few more most other some such no nor not only own
    same so than too very""".split()
)

RU_STOP_WORDS = frozenset(
    """и в во не что он на я с со как а то все она так его но да ты к у же
    вы за бы по только ее мне было вот от меня еще нет о из ему теперь
    когда даже ну вдруг ли если уже или ни быть был него до вас нибудь
    опять уж вам ведь там потом себя ничего ей может они тут где есть надо
    ней для мы тебя их чем была сам чтоб без будто чего раз тоже себе под
    будет ж тогда кто этот того потому этого какой совсем ним здесь этом
    один почти мой тем чтобы нее сейчас были куда зачем всех никогда можно
    при наконец два об другой хоть после над больше тот через эти нас про
    всего них какая много разве три эту моя впрочем хорошо свою этой перед
    иногда лучше чуть том нельзя такой им более всегда конечно всю
    между""".split()
)

_STEMMERS = {"en": (porter2_stem, EN_STOP_WORDS), "ru": (russian_stem, RU_STOP_WORDS)}


def stem_filter_py(tokens: list[str], lang: str = "en") -> list[str]:
    """stemmerFilter.Filter: drop stop words (case-sensitive membership,
    checked BEFORE stemming), stem the rest (stemmer_filter.go:33-49)."""
    stem, stops = _STEMMERS[lang]
    return [stem(t) for t in tokens if t not in stops]


def snowball_stem_filter(words: Column, lang: str = "en") -> Column:
    """P8 as a composable column op: Arrow-batched pandas UDF applying
    :func:`stem_filter_py` to an ``array<string>`` token column."""
    if lang not in _STEMMERS:
        raise ValueError(f"unsupported language: {lang!r}")

    @F.pandas_udf(ArrayType(StringType()))
    def _stem(col: pd.Series) -> pd.Series:
        # elements arrive as numpy arrays — test None explicitly
        return col.map(
            lambda ts: stem_filter_py([] if ts is None else list(ts), lang)
        )

    return _stem(words)
