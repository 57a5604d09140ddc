"""Shared semantics kernel: tokenizer + deterministic lemmatizer + HTML strip.

This module is the single source of truth for text → lemma semantics.
The Ray build pipeline (build.py), the query path (search.py) and the
single-process oracle (oracle.py) all import exactly these functions —
rank-identity between engine and oracle hinges on that.

Reference semantics being reproduced (cites into /root/reference):

* ``split_to_lemmas`` mirrors ``LemmaSearch.splitToLemmas``
  (services/LemmaSearch.java:33-56): lowercase, delete every char not
  in the alphabet (reference mode ``[^а-я\\s]`` — note ``ё`` and Latin
  and digits are DELETED, and deletion JOINS adjacent fragments because
  the replacement is the empty string), trim, split on whitespace,
  skip blanks, skip function words, lemma = FIRST normal form, count
  occurrences per lemma.
* ``is_function_word`` mirrors ``LemmaSearch.isFunctionWords``
  (services/LemmaSearch.java:58-66): the reference asks the morphology
  dictionary whether the first morph-info tag contains МЕЖД / ПРЕДЛ /
  СОЮЗ (interjection / preposition / conjunction).  Here that is a
  fixed set containing those POS classes' closed word lists.
* ``word_to_lemma`` mirrors ``LemmaSearch.wordToLemmaString``
  (services/LemmaSearch.java:72-79): lowercase, strip ``[^а-я]``,
  first normal form, "" when unknown.
* ``clear_tags`` mirrors ``LemmaSearch.clearCodeFromTags``
  (services/LemmaSearch.java:68-70 → jsoup ``Document.text()``):
  strip tags, decode entities, treat NBSP as whitespace, collapse
  whitespace runs, trim.  Validated on the reference's own golden
  (src/test/java/searchengine/services/LemmaSearchTests.java:36-48).

Three modes:

* ``reference`` — Russian, faithful to the reference (alphabet
  ``[а-я\\s]``, function-word set, dictionary + suffix-rule lemmas).
* ``latin`` — the transcripts graft's Latin-alphabet analog (alphabet
  ``[a-z\\s]``, small stop-word set, lemmatization by the shared
  deterministic inflection table from vocab.py).
* ``simple`` — lowercase + split on ``[^a-z0-9]+``, no stop words, no
  lemmatization.  Deliberately chosen to be expressible in ANSI SQL
  (DuckDB ``regexp_split_to_array(lower(text), '[^a-z0-9]+')``) so the
  driver's oracle-SQL correctness gate can verify the tokenize /
  posting / BM25 pipelines end-to-end.
"""

from __future__ import annotations

import html
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from raysearch.vocab import FORM2LEMMA, LATIN_STOPWORDS

# ---------------------------------------------------------------------------
# Russian reference-mode lemmatizer (self-contained, deterministic).
# ---------------------------------------------------------------------------

# Closed word classes whose first morph tag in the reference's Lucene
# morphology dictionary is МЕЖД / ПРЕДЛ / СОЮЗ; superset of the words the
# reference test exercises (LemmaSearchTests.java:27-33: или над под ох и
# ой) plus the ones its splitToLemmas golden drops (в, что).
RU_FUNCTION_WORDS = frozenset(
    """и в во не что он на я с со а то но к у же за бы по или над под ох
    ой о об от до из без для при про через между перед ах эх ух увы ли
    либо хотя чтобы если да ни около среди сквозь вокруг""".split()
)

# Explicit dictionary: first-normal-form choices pinned by the reference
# tests (LemmaSearchTests.java:16-24,50-57).
RU_DICT = {
    "появление": "появление",
    "леопарда": "леопард",
    "леопард": "леопард",
    "осетии": "осетия",
    "осетия": "осетия",
    "позволяет": "позволять",
    "позволять": "позволять",
    "предположить": "предположить",
    "обитает": "обитать",
    "обитать": "обитать",
    "повторное": "повторный",
    "повторный": "повторный",
    "районам": "район",
    "район": "район",
    "северного": "северный",
    "северный": "северный",
    "кавказа": "кавказ",
    "кавказ": "кавказ",
    "междометие": "междометие",
    "междометия": "междометие",
}

# Ordered generic suffix rules (longest-match wins) for words outside the
# explicit dictionary; applied deterministically so engine == oracle.
RU_SUFFIX_RULES = (
    ("ениях", "ение"), ("ениям", "ение"), ("ением", "ение"),
    ("ениями", "ение"), ("ении", "ение"), ("ения", "ение"),
    ("ирует", "ировать"), ("ируют", "ировать"),
    ("ует", "овать"), ("уют", "овать"),
    ("яет", "ять"), ("яют", "ять"),
    ("ает", "ать"), ("ают", "ать"),
    ("ит", "ить"), ("ят", "ить"),
    ("еет", "еть"), ("еют", "еть"),
    ("ого", "ый"), ("его", "ий"), ("ому", "ый"), ("ему", "ий"),
    ("ыми", "ый"), ("ими", "ий"), ("ое", "ый"), ("ее", "ий"),
    ("ая", "ый"), ("яя", "ий"), ("ую", "ый"), ("юю", "ий"),
    ("ами", "а"), ("ям", "я"), ("ях", "я"), ("ам", ""), ("ах", ""),
    ("ов", ""), ("ев", ""), ("ей", "ь"),
    ("ы", "а"), ("и", "а"), ("у", "а"), ("е", "а"), ("а", "а"),
)


def russian_lemma(word: str) -> str:
    """First-normal-form analog for reference mode; "" for blank input.

    Mirrors LemmaSearch.wordToLemmaString (LemmaSearch.java:72-79): the
    reference returns "" when the dictionary has no normal form; here
    unknown words fall through deterministic suffix rules and finally to
    identity, which keeps the synthetic Latin-free corpora indexable
    while preserving every golden-tested mapping exactly.
    """
    if not word:
        return ""
    hit = RU_DICT.get(word)
    if hit is not None:
        return hit
    for suf, rep in RU_SUFFIX_RULES:
        if word.endswith(suf) and len(word) > len(suf) + 2:
            return word[: -len(suf)] + rep
    return word


def latin_lemma(word: str) -> str:
    """Latin-mode lemma: exact lookup in the shared deterministic
    inflection table (vocab.py), identity for out-of-vocabulary words."""
    return FORM2LEMMA.get(word, word)


# ---------------------------------------------------------------------------
# Mode table
# ---------------------------------------------------------------------------

_MODES = {
    # mode: (strip_regex, joins_fragments, stopwords, lemma_fn)
    # reference deletes (joins) non-alphabet chars — LemmaSearch.java:35-36
    "reference": (r"[^а-я\s]", True, RU_FUNCTION_WORDS, russian_lemma),
    "latin": (r"[^a-z\s]", True, LATIN_STOPWORDS, latin_lemma),
    # simple mode SPLITS on non-alphanumeric (SQL-parity; see module doc)
    "simple": (r"[^a-z0-9]+", False, frozenset(), None),
}


class Lexer:
    """Tokenizer + lemmatizer for one mode.  Construct once per worker
    (actor ``__init__``) — the reference pays dictionary construction per
    page (``new LemmaSearch()`` at services/RecursiveSearch.java:68); we
    pay once per actor."""

    def __init__(self, mode: str = "latin"):
        if mode not in _MODES:
            raise ValueError(f"unknown lexer mode {mode!r}")
        self.mode = mode
        strip_re, self.joins, self.stopwords, lemma_fn = _MODES[mode]
        self.strip_re = strip_re
        self._strip = re.compile(strip_re)
        self._ws = re.compile(r"\s+")
        self.lemma_fn = lemma_fn
        # One lowercase kernel for every mode: the scalar path (queries,
        # snippets, oracle) uses Python str.lower() which maps e.g.
        # U+212A KELVIN SIGN → 'k'; pc.ascii_lower would NOT, so the
        # same text could tokenize differently at index vs query time
        # and break rank identity.  pc.utf8_lower matches str.lower()
        # on the full Unicode mapping (both are utf8proc/UCD full
        # case-folding), at ~equal vectorized cost on ASCII-heavy data.
        self._batch_lower = pc.utf8_lower
        # per-instance memo: surface form -> lemma or None (dropped)
        self._memo: dict[str, str | None] = {}

    # -- scalar path (queries, snippets, oracle) ---------------------------

    def is_function_word(self, word: str) -> bool:
        return word in self.stopwords

    def word_to_lemma(self, word: str) -> str:
        """LemmaSearch.wordToLemmaString analog (LemmaSearch.java:72-79)."""
        word = self._strip.sub("" if self.joins else " ", word.lower()).strip()
        if not word or self.lemma_fn is None:
            return word
        return self.lemma_fn(word)

    def _resolve(self, word: str) -> str | None:
        """lemma for a pre-stripped surface form, None if dropped."""
        memo = self._memo
        hit = memo.get(word, 0)
        if hit != 0:
            return hit
        if not word or word in self.stopwords:
            lemma = None
        elif self.lemma_fn is None:
            lemma = word
        else:
            lemma = self.lemma_fn(word)
        memo[word] = lemma
        return lemma

    def tokenize(self, text: str) -> list[str]:
        """Order-preserving kept-lemma sequence (snippet path,
        SnippetSearch.java:14-29 analog)."""
        cleaned = self._strip.sub("" if self.joins else " ", text.lower()).strip()
        if not cleaned:
            return []
        out = []
        for w in self._ws.split(cleaned):
            lemma = self._resolve(w)
            if lemma is not None:
                out.append(lemma)
        return out

    def split_to_lemmas(self, text: str) -> dict[str, int]:
        """LemmaSearch.splitToLemmas analog (LemmaSearch.java:33-56):
        lemma → occurrence count (tf)."""
        counts: dict[str, int] = {}
        for lemma in self.tokenize(text):
            counts[lemma] = counts.get(lemma, 0) + 1
        return counts

    # -- vectorized batch path (build pipeline hot loop) -------------------

    def token_parent_codes(
        self, texts: pa.ChunkedArray | pa.Array
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Vectorized tokenize of a batch of texts, codes form.

        Returns ``(parent_idx, lemma_codes, uniq_lemmas)`` where
        ``parent_idx[i]`` is the row index owning kept token i,
        ``lemma_codes[i]`` indexes into ``uniq_lemmas`` (object array of
        distinct lemma strings), stop words and blanks already dropped.
        Vectorization strategy: Arrow kernels (utf8_lower,
        replace_substring_regex, split) produce the flat token array;
        the per-token lemma lookup runs once per DISTINCT surface form
        (dictionary-encode) and is broadcast back as INTEGER codes — no
        materialized per-token object array, no downstream re-factorize
        (per-token Python-object traffic measurably dominates the
        tokenize stage's memory bandwidth at batch sizes ~10^6 tokens).
        """
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lowered = self._batch_lower(texts)
        if self.joins:
            cleaned = pc.replace_substring_regex(lowered, self.strip_re, "")
            tokens = pc.split_pattern_regex(cleaned, r"\s+")
        else:
            tokens = pc.split_pattern_regex(lowered, self.strip_re)
        flat = pc.list_flatten(tokens)
        parent = pc.list_parent_indices(tokens).to_numpy(zero_copy_only=False)
        dictized = pc.dictionary_encode(flat)
        if isinstance(dictized, pa.ChunkedArray):
            dictized = dictized.combine_chunks()
        indices = dictized.indices.to_numpy(zero_copy_only=False)
        uniques = dictized.dictionary.to_pylist()
        # surface code -> lemma code (or -1 dropped), Python only over uniques
        resolve = self._resolve
        lemma_ids: dict[str, int] = {}
        uniq_lemmas: list[str] = []
        surf2lemma = np.empty(len(uniques), dtype=np.int64)
        for i, u in enumerate(uniques):
            lemma = resolve(u)
            if lemma is None:
                surf2lemma[i] = -1
                continue
            code = lemma_ids.get(lemma)
            if code is None:
                code = lemma_ids[lemma] = len(uniq_lemmas)
                uniq_lemmas.append(lemma)
            surf2lemma[i] = code
        codes = surf2lemma[indices]
        keep = codes >= 0
        return parent[keep], codes[keep], np.array(uniq_lemmas, dtype=object)

    def token_parent_pairs(
        self, texts: pa.ChunkedArray | pa.Array
    ) -> tuple[np.ndarray, np.ndarray]:
        """Compatibility wrapper over :meth:`token_parent_codes`:
        returns ``(parent_idx, lemmas)`` with the per-token lemma
        strings materialized (object array)."""
        parent, codes, uniq = self.token_parent_codes(texts)
        return parent, uniq[codes] if len(codes) else np.empty(0, dtype=object)


# ---------------------------------------------------------------------------
# HTML strip (jsoup Document.text() analog) — M1 in SURVEY §2.2.
# ---------------------------------------------------------------------------

_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"[\s ]+")


def clear_tags(content: str) -> str:
    """LemmaSearch.clearCodeFromTags analog (LemmaSearch.java:68-70).

    jsoup's ``text()`` strips tags, decodes entities, treats NBSP
    (``&#160;``) as whitespace, collapses whitespace runs to a single
    space and trims; validated against the reference golden at
    LemmaSearchTests.java:36-48.
    """
    text = _TAG_RE.sub("", content)
    text = html.unescape(text)
    return _WS_RE.sub(" ", text).strip()


# ---------------------------------------------------------------------------
# Query validation — M8 in SURVEY §2.2 (SearchServiceImpl.java:36-41,77-80).
# ---------------------------------------------------------------------------

_QUERY_RE = {
    "reference": re.compile(r"^[А-Яа-яёЁ\d\s!-/:-@\[-`{-~]+$"),
    "latin": re.compile(r"^[A-Za-z\d\s!-/:-@\[-`{-~]+$"),
    "simple": re.compile(r"^[A-Za-z\d\s!-/:-@\[-`{-~]+$"),
}

EMPTY_QUERY_ERROR = "Задан пустой поисковый запрос"
BAD_ALPHABET_ERROR = "Запрос должен быть на русском языке"


def validate_query(query: str, mode: str = "latin") -> str | None:
    """Returns an error string (reference wording,
    SearchServiceImpl.java:36-41) or None when the query is valid."""
    if not query or query.isspace() or not query.strip():
        return EMPTY_QUERY_ERROR
    if not _QUERY_RE[mode].match(query):
        return BAD_ALPHABET_ERROR
    return None
