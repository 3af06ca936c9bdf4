"""Hashed char-trigram Naive-Bayes language-id model (VERDICT r5 #7).

The heuristic :func:`zhtml_spark.textops.lang_id` votes on a dozen
stopwords per language — defensible as a smoke signal, not at corpus
scale where short or stopword-poor pages abound.  This module holds
the v2 model: per-language log-probability weights over HASHED char
trigrams, trained once at import time from the small seed corpora
below (original text written for this repo; no external data).

Design constraints, in order:

* **cross-engine exact** — the weights are pre-baked INTEGERS
  (``round(1e6 * ln(p))``) computed in ONE place (here, in Python);
  both the Spark literal arrays and the generated DuckDB ``VALUES``
  table come from this module, so no engine ever computes a ``ln``
  and the score sums are exact BIGINT folds;
* **hashing-trick** — trigram → ``md5-48 % N_BUCKETS`` (the blessed
  cross-engine hash), so the weight table is a fixed
  ``N_BUCKETS``-slot array per language regardless of vocabulary —
  the same shape as ``textops.embed_hashing``.  N_BUCKETS (4096)
  deliberately EXCEEDS the seed vocabulary (~1.3k distinct trigrams
  per language): at 256 buckets gibberish trigrams collided into
  buckets carrying real mass and scored within ~0.2e6 of natural
  text (measured r6) — above the vocabulary size, unseen trigrams
  land on the smoothing floor and the LM gate separates cleanly;
* **deterministic** — no RNG anywhere; retraining is a pure function
  of the seed text.

At 10^12 docs the scoring pass is embarrassingly parallel: one JVM
fold per language over the per-doc bucket array, weights broadcast as
plan literals (k × N_BUCKETS ints), zero shuffles, zero Python.  Accuracy
is the usual NB-over-trigram story — solid for separating distant
languages, NOT a replacement for a real fastText-style model; the
seed corpora are deliberately small and auditable.
"""

from __future__ import annotations

import hashlib
import math
from functools import lru_cache

N_BUCKETS = 4096
_SCALE = 1_000_000

# Original seed text (written for this repo; lowercase, one string
# per language).  Short on purpose: the model must stay auditable and
# the oracle-side VALUES table small.
SEED_TEXTS: dict[str, str] = {
    "en": (
        "the quick brown fox jumps over the lazy dog while the "
        "children watch from the garden and talk about their day at "
        "school. it is a good thing that we have found this quiet "
        "place for the summer holidays. there will be more rain in "
        "the north of the country during the night and the morning "
        "trains could be late again. she said that the old library "
        "near the market still keeps the maps of the river valley."
    ),
    "es": (
        "el perro corre por el parque mientras los niños juegan con "
        "la pelota y hablan de sus cosas. es una buena idea que "
        "vayamos a la playa este verano porque hace mucho calor en "
        "la ciudad. mañana habrá más lluvia en el norte del país "
        "durante la noche y los trenes de la mañana podrían llegar "
        "tarde otra vez. ella dijo que la vieja biblioteca cerca del "
        "mercado todavía guarda los mapas del valle del río."
    ),
    "de": (
        "der hund läuft durch den park während die kinder mit dem "
        "ball spielen und über ihren tag sprechen. es ist eine gute "
        "idee dass wir im sommer ans meer fahren weil es in der "
        "stadt sehr heiß ist. morgen wird es im norden des landes "
        "in der nacht mehr regen geben und die züge am morgen "
        "könnten wieder zu spät kommen. sie sagte dass die alte "
        "bibliothek am markt noch die karten des flusstals hat."
    ),
}


def bucket_of(gram: str, n_buckets: int = N_BUCKETS) -> int:
    """md5-48 % n_buckets — mirrors ``textops.md5_hash48`` (first 12
    hex chars of md5 as int) so Spark / DuckDB / Python agree."""
    return int(hashlib.md5(gram.encode("utf-8")).hexdigest()[:12], 16) % n_buckets


@lru_cache(maxsize=None)
def trigram_weights(
    n_buckets: int = N_BUCKETS,
) -> dict[str, tuple[int, ...]]:
    """lang → ``n_buckets`` integer weights: add-one-smoothed trigram
    log-probabilities, quantized at 1e-6.  Pure function of
    SEED_TEXTS; cached."""
    out: dict[str, tuple[int, ...]] = {}
    for lang, text in SEED_TEXTS.items():
        counts = [0] * n_buckets
        total = 0
        for i in range(len(text) - 2):
            counts[bucket_of(text[i : i + 3], n_buckets)] += 1
            total += 1
        out[lang] = tuple(
            round(_SCALE * math.log((c + 1) / (total + n_buckets)))
            for c in counts
        )
    return out
