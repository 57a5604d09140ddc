"""Deterministic shared vocabulary + inflection table (FIXTURES.md §1).

~2,000 lemmas mapped onto ~5,000 surface forms by a deterministic
inflection table, so Latin-mode lemmatization is nontrivial (an
inflected query form must match documents via the lemma).  Both the
corpus generator (gen.py — emits surface forms) and the lexer (lex.py —
inverts them) import this module, which makes lemmatization exact by
construction; this mirrors how the reference relies on one shared
morphology dictionary (services/LemmaSearch.java:20,24-31) for both
index and query paths.

Everything here is seeded and wall-clock-free: same table in every
process at every parallelism level.
"""

from __future__ import annotations

import random

VOCAB_SEED = 42
N_LEMMAS = 2000

# Latin-mode function words (analog of the МЕЖД/ПРЕДЛ/СОЮЗ drop at
# services/LemmaSearch.java:22,58-66).
LATIN_STOPWORDS = frozenset(
    "the a an and or of in on to is was it for with as at by be".split()
)

_CONSONANTS = "bcdfghklmnprstvz"
_VOWELS = "aeiou"
_SYLLABLES = [c + v for c in _CONSONANTS for v in _VOWELS]

# Inflection suffix families; a lemma is assigned one family and emits
# one surface form per suffix (deterministically).
_SUFFIX_FAMILIES = [
    ("", "s"),
    ("", "s", "ed"),
    ("", "s", "ing"),
    ("", "ed", "ing"),
    ("", "s", "ed", "ing"),
    ("", "er", "est"),
    ("", "ly"),
    ("",),
]


def _build() -> tuple[list[str], dict[str, str], dict[str, list[str]]]:
    rng = random.Random(VOCAB_SEED)
    lemmas: list[str] = []
    seen: set[str] = set(LATIN_STOPWORDS)
    while len(lemmas) < N_LEMMAS:
        word = "".join(rng.choice(_SYLLABLES) for _ in range(rng.randint(2, 4)))
        if word not in seen:
            seen.add(word)
            lemmas.append(word)
    form2lemma: dict[str, str] = {}
    # base forms first so every lemma maps to itself even when an
    # inflected form of an earlier lemma collides with it
    for lemma in lemmas:
        form2lemma[lemma] = lemma
    lemma_forms: dict[str, list[str]] = {}
    for lemma in lemmas:
        family = _SUFFIX_FAMILIES[rng.randrange(len(_SUFFIX_FAMILIES))]
        forms = []
        for suffix in family:
            form = lemma + suffix
            if form not in form2lemma:
                form2lemma[form] = lemma
            if form2lemma[form] == lemma:
                forms.append(form)
        lemma_forms[lemma] = forms
    return lemmas, form2lemma, lemma_forms


#: lemma list in deterministic (frequency-rank) order — gen.py samples
#: ranks from a Zipf(s≈1.1) distribution over this order.
LEMMAS, FORM2LEMMA, LEMMA_FORMS = _build()
