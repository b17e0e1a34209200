"""Rule-based detection and candidate filtering.

Re-expresses `api/LanguageDetector.kt:376-473` (``detect_language_with_rules``)
and `:475-543` (``filter_languages_by_rules``) over codepoint arrays with
precomputed vote tables. All magic constants live in ``langdata``.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from .. import langdata as L
from ..uniscript import N_SCRIPTS, SCRIPT_ID, cat_ids, script_ids
from .text import is_logogram_char

_LATIN = SCRIPT_ID["LATIN"]
_CYRILLIC = SCRIPT_ID["CYRILLIC"]
_DEVANAGARI = SCRIPT_ID["DEVANAGARI"]
_HAN = SCRIPT_ID["HAN"]
_HIRAGANA = SCRIPT_ID["HIRAGANA"]
_KATAKANA = SCRIPT_ID["KATAKANA"]
_OTHER = 0

UNKNOWN_ORD = L.N_LANGUAGES  # sentinel ordinal for UNKNOWN in vote vectors

# codepoint -> unique-char group id (-1 = none); group -> ordinals voting
_MAX_CP = 0x30000


@lru_cache(maxsize=1)
def _unique_char_table() -> tuple[np.ndarray, list[np.ndarray]]:
    groups: dict[tuple[int, ...], int] = {}
    table = np.full(_MAX_CP, -1, dtype=np.int16)
    group_list: list[np.ndarray] = []
    per_char: dict[int, list[int]] = {}
    for lang in L.LANGUAGES_WITH_UNIQUE_CHARS:
        for ch in lang.unique_chars:
            per_char.setdefault(ord(ch), []).append(lang.ordinal)
    for cp, ords in per_char.items():
        key = tuple(ords)
        gid = groups.get(key)
        if gid is None:
            gid = len(group_list)
            groups[key] = gid
            group_list.append(np.array(ords, dtype=np.int64))
        if cp < _MAX_CP:
            table[cp] = gid
    return table, group_list


@lru_cache(maxsize=1)
def _chars_to_languages_table() -> tuple[np.ndarray, list[np.ndarray]]:
    """codepoint -> group id into CHARS_TO_LANGUAGES ordinal arrays."""
    table = np.full(_MAX_CP, -1, dtype=np.int16)
    group_list: list[np.ndarray] = []
    seen: dict[tuple[str, ...], int] = {}
    for ch, langs in L.CHARS_TO_LANGUAGES.items():
        gid = seen.get(langs)
        if gid is None:
            gid = len(group_list)
            seen[langs] = gid
            group_list.append(
                np.array([L.ORDINAL[n] for n in langs], dtype=np.int64)
            )
        cp = ord(ch)
        if cp < _MAX_CP:
            table[cp] = gid
    return table, group_list


@lru_cache(maxsize=8)
def _primary_vote_table(languages: frozenset[str]) -> np.ndarray:
    """script id -> voted ordinal (or -1).

    Covers the reference's branch ladder (LanguageDetector.kt:387-400):
    unique-alphabet languages (restricted to the detector's set), then
    HAN -> CHINESE, then Japanese scripts -> JAPANESE.
    """
    table = np.full(N_SCRIPTS, -1, dtype=np.int64)
    for script, lang in L.SCRIPTS_SUPPORTING_EXACTLY_ONE_LANGUAGE.items():
        if lang in languages:
            table[SCRIPT_ID[script]] = L.ORDINAL[lang]
    table[_HAN] = L.ORDINAL["CHINESE"]
    # Hiragana/Katakana vote JAPANESE either via the unique-alphabet map or
    # the isJapaneseScript fallthrough — same target either way.
    table[_HIRAGANA] = L.ORDINAL["JAPANESE"]
    table[_KATAKANA] = L.ORDINAL["JAPANESE"]
    return table


_ALL_LANG_NAMES = tuple(l.name for l in L.LANGUAGES)


@lru_cache(maxsize=8)
def _rules_setup(languages: tuple[str, ...]):
    """(in_detector mask, primary-vote table, uniq-lang mask) for a
    languages tuple — rebuilt per ROW before this cache existed (three
    79-iteration Python loops per call, measured in the profile)."""
    lang_set = frozenset(languages)
    in_detector = np.zeros(L.N_LANGUAGES, dtype=bool)
    for name in languages:
        in_detector[L.ORDINAL[name]] = True
    primary = _primary_vote_table(lang_set)
    uniq_lang_ok = np.zeros(L.N_LANGUAGES, dtype=bool)
    for lang in L.LANGUAGES_WITH_UNIQUE_CHARS:
        if lang.name in lang_set:
            uniq_lang_ok[lang.ordinal] = True
    return in_detector, primary, uniq_lang_ok


def detect_language_with_rules(
    codes: np.ndarray,
    spans: np.ndarray,
    languages: tuple[str, ...] = _ALL_LANG_NAMES,
) -> str:
    """Per-word rule voting; returns a language name or 'UNKNOWN'."""
    in_detector, primary, uniq_lang_ok = _rules_setup(languages)
    uniq_table, uniq_groups = _unique_char_table()

    sids_all = script_ids(codes)
    logo_all = is_logogram_char(codes)
    prim_all = primary[sids_all]
    ucd_all = (
        (sids_all == _LATIN) | (sids_all == _CYRILLIC) | (sids_all == _DEVANAGARI)
    )
    gids_all = uniq_table[np.minimum(codes, _MAX_CP - 1)]
    uc_hit_all = ucd_all & (gids_all >= 0)

    # Fast path (exact): if NO character in the text casts a primary-script
    # or unique-char vote, every word votes UNKNOWN, the UNKNOWN fraction
    # is 100% (never zeroed by the cut), and the result is UNKNOWN — the
    # common case for shared-script text without special characters.
    if not (uc_hit_all.any() or (prim_all >= 0).any()):
        return L.UNKNOWN

    totals = np.zeros(L.N_LANGUAGES + 1, dtype=np.float64)  # [-1] = UNKNOWN
    adjusted_word_count = 0.0

    # bulk-count words with NO voting character (the common case on
    # shared-script text): they all contribute FULL_WORD_VALUE to UNKNOWN,
    # so only voting words need the per-word Python loop
    vote_all = uc_hit_all | (prim_all >= 0)
    cs = np.concatenate(([0], np.cumsum(vote_all)))
    has_vote = (cs[spans[:, 1]] - cs[spans[:, 0]]) > 0
    n_novote = int((~has_vote).sum())
    totals[UNKNOWN_ORD] += L.FULL_WORD_VALUE * n_novote
    adjusted_word_count += L.FULL_WORD_VALUE * n_novote

    for s, e in spans[has_vote]:
        prim_hits = prim_all[s:e]
        prim_hits = prim_hits[prim_hits >= 0]
        uc = np.flatnonzero(uc_hit_all[s:e])
        votes = np.zeros(L.N_LANGUAGES, dtype=np.int64)
        if prim_hits.size:
            np.add.at(votes, prim_hits, 1)
        for gid in gids_all[s + uc]:
            ords = uniq_groups[gid]
            sel = ords[uniq_lang_ok[ords]]
            votes[sel] += 1

        word_value = L.FULL_WORD_VALUE
        nz = np.flatnonzero(votes)
        if nz.size == 0:
            totals[UNKNOWN_ORD] += word_value
        elif nz.size == 1:
            o = nz[0]
            if in_detector[o]:
                if e - s == 1 and logo_all[s]:
                    word_value = L.LOGOGRAM_WORD_VALUE
                totals[o] += word_value
            else:
                totals[UNKNOWN_ORD] += word_value
        else:
            counts = votes[nz]
            order = np.lexsort((nz, -counts))  # count desc, ordinal asc
            first, second = nz[order[0]], nz[order[1]]
            if votes[first] > votes[second] and in_detector[first]:
                totals[first] += word_value
            else:
                totals[UNKNOWN_ORD] += word_value
        adjusted_word_count += word_value

    if totals[UNKNOWN_ORD] < L.UNKNOWN_WORD_FRACTION_CUT * adjusted_word_count:
        totals[UNKNOWN_ORD] = 0.0

    nz = np.flatnonzero(totals)
    if nz.size == 0:
        return L.UNKNOWN
    if nz.size == 1:
        o = nz[0]
        return L.UNKNOWN if o == UNKNOWN_ORD else L.LANGUAGES[o].name
    zh, ja = L.ORDINAL["CHINESE"], L.ORDINAL["JAPANESE"]
    if nz.size == 2 and totals[zh] != 0.0 and totals[ja] != 0.0:
        return "JAPANESE"
    counts = totals[nz]
    order = np.lexsort((nz, -counts))
    first, second = nz[order[0]], nz[order[1]]
    if totals[second] / totals[first] > L.CLOSE_WORD_COUNT_RATIO:
        return L.UNKNOWN
    return L.UNKNOWN if first == UNKNOWN_ORD else L.LANGUAGES[first].name


@lru_cache(maxsize=1)
def _c2l_flat() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """CHARS_TO_LANGUAGES groups flattened for vectorized expansion:
    (flat ordinals, per-group start offsets (G+1,), per-group lengths)."""
    _, groups = _chars_to_languages_table()
    lens = np.array([g.size for g in groups], dtype=np.int64)
    offsets = np.zeros(lens.size + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    flat = (
        np.concatenate(groups)
        if groups
        else np.empty(0, dtype=np.int64)
    )
    return flat, offsets, lens


@lru_cache(maxsize=8)
def _lang_masks(languages: frozenset[str]) -> tuple[np.ndarray, np.ndarray]:
    """(detector mask (NL,), script->langs matrix (N_SCRIPTS, NL))."""
    det_mask = np.zeros(L.N_LANGUAGES, dtype=bool)
    for name in languages:
        det_mask[L.ORDINAL[name]] = True
    script_langs = np.zeros((N_SCRIPTS, L.N_LANGUAGES), dtype=bool)
    for lang in L.LANGUAGES:
        for s in lang.scripts:
            script_langs[SCRIPT_ID[s], lang.ordinal] = True
    return det_mask, script_langs


def filter_languages_mask(
    codes: np.ndarray,
    spans: np.ndarray,
    languages: tuple[str, ...] = _ALL_LANG_NAMES,
) -> np.ndarray:
    """Candidate-language pruning; returns a (N_LANGUAGES,) boolean mask."""
    det_mask, script_langs = _lang_masks(frozenset(languages))
    sids_all = script_ids(codes)
    logo_all = is_logogram_char(codes)

    # Vectorized per-word alphabet voting (replaces the word loop; exact:
    # word values are dyadic 1.0/0.5, so summation order cannot change the
    # totals). A word votes its script iff all its chars share one
    # non-OTHER script; single-char logogram words count half.
    n_words = spans.shape[0]
    alphabet_votes = np.zeros(N_SCRIPTS, dtype=np.float64)
    adjusted_word_count = 0.0
    if n_words:
        starts = spans[:, 0]
        ends = spans[:, 1]
        mark = np.zeros(codes.size + 1, dtype=np.int8)
        mark[starts] += 1
        mark[ends] -= 1
        pos = np.flatnonzero(np.cumsum(mark[:-1]) > 0)
        wid = np.searchsorted(starts, pos, side="right") - 1
        packed = sids_all[pos]
        offsets = np.searchsorted(wid, np.arange(n_words + 1))
        wmin = np.minimum.reduceat(packed, offsets[:-1])
        wmax = np.maximum.reduceat(packed, offsets[:-1])
        sid0 = packed[offsets[:-1]]
        const = (wmin == wmax) & (sid0 != _OTHER)
        logoword = ((ends - starts) == 1) & logo_all[starts]
        word_value = np.where(
            const & logoword, L.LOGOGRAM_WORD_VALUE, L.FULL_WORD_VALUE
        )
        np.add.at(alphabet_votes, sid0[const], word_value[const])
        adjusted_word_count = float(word_value.sum())

    if not alphabet_votes.any():
        return det_mask.copy()

    max_vote = alphabet_votes.max()
    frequent = (alphabet_votes > 0) & (
        alphabet_votes / max_vote >= L.CLOSE_ALPHABET_RATIO
    )
    filtered_mask = det_mask & script_langs[frequent].any(axis=0)

    # CHARS_TO_LANGUAGES counting: each language at most once per word
    # (LanguageDetector.kt:518-535); words without mapped chars are skipped.
    # Vectorized over (word, group) pairs — the previous per-word Python
    # loop with an inner per-char group walk was ~15% of assess_batch on
    # 300-char rows. Semantics preserved exactly: a word contributes +1 to
    # ordinal o iff o is in filtered_mask and in ANY mapped char group of
    # the word (the old `seen` union; visit order never changed the union).
    c2l_table, _c2l_groups_ = _chars_to_languages_table()
    gids_all = c2l_table[np.minimum(codes, _MAX_CP - 1)]
    lang_counts = np.zeros(L.N_LANGUAGES, dtype=np.int64)
    if n_words and (gids_all >= 0).any():
        cov_gid = gids_all[pos]
        cov_hit = cov_gid >= 0
    else:
        cov_hit = np.zeros(0, dtype=bool)
    if cov_hit.any():
        flat, offsets, lens = _c2l_flat()
        n_groups = lens.size
        pair = wid[cov_hit] * n_groups + cov_gid[cov_hit].astype(np.int64)
        upair = np.unique(pair)
        uw = upair // n_groups
        ug = upair % n_groups
        # expand each (word, group) pair into that group's ordinals
        plens = lens[ug]
        total = int(plens.sum())
        pstart = np.zeros(plens.size, dtype=np.int64)
        np.cumsum(plens[:-1], out=pstart[1:])
        flat_idx = (
            np.repeat(offsets[ug] - pstart, plens)
            + np.arange(total, dtype=np.int64)
        )
        ords = flat[flat_idx]
        words = np.repeat(uw, plens)
        keep_p = filtered_mask[ords]
        if keep_p.any():
            # distinct (word, ordinal) pairs -> counts per ordinal
            wo = np.unique(
                words[keep_p] * np.int64(L.N_LANGUAGES) + ords[keep_p]
            )
            lang_counts = np.bincount(
                wo % np.int64(L.N_LANGUAGES), minlength=L.N_LANGUAGES
            ).astype(np.int64)

    subset_mask = filtered_mask & (lang_counts >= adjusted_word_count / 2.0)
    return subset_mask if subset_mask.any() else filtered_mask


def filter_languages_by_rules(
    codes: np.ndarray,
    spans: np.ndarray,
    languages: tuple[str, ...] = _ALL_LANG_NAMES,
) -> tuple[str, ...]:
    """Candidate-language pruning; returns names in ordinal order."""
    mask = filter_languages_mask(codes, spans, languages)
    return tuple(L.LANGUAGES[o].name for o in np.flatnonzero(mask))
