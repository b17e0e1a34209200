"""N-gram frequency model tables: training, Parquet I/O, packed lookup.

Model semantics follow the reference's generated models
(`buildSrc/.../GenerateLanguageModelsTask.kt:176-187` + upstream lingua):
for n >= 2 the frequency of an n-gram is ``count(ngram) / count((n-1)-prefix)``;
for unigrams it is ``count / total letters``. Frequencies are stored float32
and widened to float64 before ``ln`` (`UniBiTrigramLookup.kt:36-66`,
`LanguageDetector.kt:624`).

Physicalization for Spark: a lineage-friendly Parquet table
``(lang, n, ngram, freq)`` plus a packed broadcast form — per n a sorted
uint64 FNV-1a key array and a dense float32 (n_keys, n_languages) matrix —
the broadcast-hash-join analog of the reference's per-language binary models
(SURVEY.md §1.2). At 100 TB the packed form is broadcast once per job
(~150 MB budget for real lingua-scale models, `README.md:14-17`).
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass
from pathlib import Path

import numpy as np
import pandas as pd

from . import langdata as L
from .core.ngram import fnv1a
from .core.text import clean_up
from .uniscript import CAT_LETTER, cat_ids, codes_of

NGRAM_RANGE = range(1, 6)


def _letter_ngrams(line: str, n: int) -> list[str]:
    """All (non-dedup) letter-only n-grams of a cleaned line."""
    codes = codes_of(line)
    letters = cat_ids(codes) == CAT_LETTER
    out = []
    for i in range(len(line) - n + 1):
        if letters[i : i + n].all():
            out.append(line[i : i + n])
    return out


def train_models(corpus: dict[str, list[str]]) -> pd.DataFrame:
    """corpus: lang name -> training lines. Returns (lang, n, ngram, freq)."""
    rows: list[tuple[str, int, str, np.float32]] = []
    for lang, lines in sorted(corpus.items()):
        counts: dict[int, Counter] = {n: Counter() for n in NGRAM_RANGE}
        for raw in lines:
            line = clean_up(raw)
            for n in NGRAM_RANGE:
                counts[n].update(_letter_ngrams(line, n))
        total_unigrams = sum(counts[1].values())
        for n in NGRAM_RANGE:
            for gram, c in counts[n].items():
                if n == 1:
                    denom = total_unigrams
                else:
                    denom = counts[n - 1][gram[:-1]]
                if denom:
                    rows.append((lang, n, gram, np.float32(c / denom)))
    return pd.DataFrame(rows, columns=["lang", "n", "ngram", "freq"]).astype(
        {"lang": "string", "n": "int8", "ngram": "string", "freq": "float32"}
    )


def write_model_table(df: pd.DataFrame, path: str | Path) -> None:
    df.to_parquet(path, index=False)


def read_model_table(path: str | Path) -> pd.DataFrame:
    return pd.read_parquet(path)


@dataclass
class PackedModels:
    """Driver-packed broadcastable lookup: per n, sorted hash keys + dense
    float32 frequency matrix over all languages (ordinal-indexed columns)."""

    keys: dict[int, np.ndarray]  # n -> sorted uint64 (k_n,)
    freqs: dict[int, np.ndarray]  # n -> float32 (k_n, N_LANGUAGES)

    @classmethod
    def from_table(cls, df: pd.DataFrame) -> "PackedModels":
        keys: dict[int, np.ndarray] = {}
        freqs: dict[int, np.ndarray] = {}
        for n in NGRAM_RANGE:
            sub = df[df["n"] == n]
            if len(sub) == 0:
                keys[n] = np.empty(0, dtype=np.uint64)
                freqs[n] = np.empty((0, L.N_LANGUAGES), dtype=np.float32)
                continue
            h = np.fromiter(
                (fnv1a(g) for g in sub["ngram"]), dtype=np.uint64, count=len(sub)
            )
            uniq = np.unique(h)
            mat = np.zeros((len(uniq), L.N_LANGUAGES), dtype=np.float32)
            rows = np.searchsorted(uniq, h)
            cols = sub["lang"].map(L.ORDINAL).to_numpy(dtype=np.int64)
            mat[rows, cols] = sub["freq"].to_numpy(dtype=np.float32)
            keys[n] = uniq
            freqs[n] = mat
        return cls(keys=keys, freqs=freqs)

    def lookup(
        self, n: int, hashes: np.ndarray, cols: np.ndarray | None = None
    ) -> np.ndarray:
        """(k,) uint64 -> (k, n_cols) float32; 0 where missing. ``cols``
        restricts (and orders) the language columns returned."""
        keys = self.keys[n]
        ncols = L.N_LANGUAGES if cols is None else len(cols)
        if keys.size == 0 or hashes.size == 0:
            return np.zeros((hashes.size, ncols), dtype=np.float32)
        idx = np.searchsorted(keys, hashes)
        idx_c = np.minimum(idx, keys.size - 1)
        found = keys[idx_c] == hashes
        if cols is None:
            out = self.freqs[n][idx_c]
        else:
            out = self.freqs[n][idx_c[:, None], cols[None, :]]
        return np.where(found[:, None], out, np.float32(0.0))

    def nbytes(self) -> int:
        return sum(a.nbytes for a in self.keys.values()) + sum(
            a.nbytes for a in self.freqs.values()
        )


@dataclass
class DictBackedModels:
    """Alternative lookup backend — the ``withIncreasedDetectionSpeed``
    trade (`api/LanguageDetectorBuilder.kt:141-144`,
    `internal/model/lookup/UniBiTrigramLookup.kt:216-225`): swap the
    sorted-array binary search for a prebuilt hash-dict index (more driver
    memory, O(1) per probe). Returns values identical to
    ``PackedModels.lookup`` — same freqs matrices, same miss semantics —
    so every parity test holds on both backends (tests/test_parity.py).

    Benchmark verdict (BENCH/BASELINE.md): on this environment the
    vectorized ``np.searchsorted`` path is FASTER for the batch sizes the
    engine actually issues (hundreds-to-thousands of probes per call),
    because the dict path pays a per-element Python round trip. The
    ``QualityConfig.increased_detection_speed`` flag therefore selects
    this backend only for API parity; the default is the measured winner.
    """

    base: PackedModels
    index: dict[int, dict[int, int]]  # n -> hash -> row in freqs[n]

    @classmethod
    def from_packed(cls, base: PackedModels) -> "DictBackedModels":
        index = {
            n: {int(h): i for i, h in enumerate(keys)}
            for n, keys in base.keys.items()
        }
        return cls(base=base, index=index)

    def lookup(
        self, n: int, hashes: np.ndarray, cols: np.ndarray | None = None
    ) -> np.ndarray:
        ncols = L.N_LANGUAGES if cols is None else len(cols)
        if hashes.size == 0 or not self.index.get(n):
            return np.zeros((hashes.size, ncols), dtype=np.float32)
        idx = self.index[n]
        rows = np.fromiter(
            (idx.get(int(h), -1) for h in hashes),
            dtype=np.int64,
            count=hashes.size,
        )
        found = rows >= 0
        rows_c = np.maximum(rows, 0)
        if cols is None:
            out = self.base.freqs[n][rows_c]
        else:
            out = self.base.freqs[n][rows_c[:, None], cols[None, :]]
        return np.where(found[:, None], out, np.float32(0.0))

    def nbytes(self) -> int:
        import sys

        return self.base.nbytes() + sum(
            sys.getsizeof(d) for d in self.index.values()
        )


def to_oracle_dicts(df: pd.DataFrame) -> dict[str, dict[int, dict[str, float]]]:
    """lang -> n -> ngram -> float32 frequency (pure-Python oracle form)."""
    out: dict[str, dict[int, dict[str, float]]] = {}
    for lang, n, gram, freq in df.itertuples(index=False):
        out.setdefault(lang, {}).setdefault(int(n), {})[gram] = np.float32(freq)
    return out
