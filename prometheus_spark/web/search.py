"""Search API — fuzzy autocomplete over metric names, label names, and
label values (reference: web/api/v1/search.go, filters
web/api/v1/search_filters.go, scorers util/strutil/subsequence.go and
util/strutil/jarowinkler.go; all re-derived, not translated).

Stream contract (search.go:16-37): successful responses are NDJSON —
zero or more ``{"results": [...]}`` batch lines (the first batch always
emits, even empty) followed by a ``{"status": "success", "has_more":
bool}`` trailer line.

The candidate value sets (distinct metric names / label keys / label
values) come from distributed aggregations over the samples frame; only
the distinct strings reach the driver, where filtering and scoring run —
the same split the reference makes (index lookup in storage, filter
chain at the API).
"""

from __future__ import annotations

from typing import Callable, Optional

DEFAULT_LIMIT = 100  # search.go:65 defaultSearchLimit
DEFAULT_BATCH_SIZE = 100  # search.go:68 defaultSearchBatchSize
MAX_SEARCH_TERMS = 32  # search.go:75 maxSearchTermsPerRequest
FUZZ_ALGORITHMS = ("subsequence", "jarowinkler")
# subsequence.go:23 — non-exact matches scale just below 1.0
_NON_EXACT_SCALE = 0.999


def substring_score(query: str, value: str) -> tuple[bool, float]:
    """search_filters.go:49 — prefix scores 1.0; later match positions
    scale down to 0.1."""
    if query == "":
        return True, 1.0
    idx = value.find(query)
    if idx < 0:
        return False, 0.0
    if idx == 0:
        return True, 1.0
    max_pos = len(value) - len(query)
    if max_pos <= 0:
        return True, 1.0
    return True, 1.0 - 0.9 * idx / max_pos


def subsequence_score(pattern: str, text: str) -> float:
    """subsequence.go:59 greedy subsequence scorer: raw score =
    Σ(run²) − Σ(gap/len) − trailing/(2·len), normalized by |pattern|²
    and scaled below 1.0 for non-exact matches."""
    if pattern == "":
        return 1.0
    if text == "":
        return 0.0
    if pattern == text:
        return 1.0
    n, m = len(pattern), len(text)
    if n > m:
        return 0.0
    inv = 1.0 / m

    def score_from(start: int) -> Optional[float]:
        i = start
        pi = 0
        score = 0.0
        prev_to = -1
        while pi < n:
            j = text.find(pattern[pi], i)
            if j < 0:
                return None
            frm = to = j
            pi += 1
            i = j + 1
            while pi < n and i < m and text[i] == pattern[pi]:
                to = i
                pi += 1
                i += 1
            # first interval: gap == frm (leading penalty, prev_to=-1)
            gap = frm - prev_to - 1
            if gap > 0:
                score -= gap * inv
            size = to - frm + 1
            score += float(size * size)
            prev_to = to
        trailing = m - 1 - prev_to
        if trailing > 0:
            score -= trailing * inv * 0.5
        return score

    best = None
    i = 0
    max_start = m - n
    while i <= max_start:
        j = text.find(pattern[0], i, max_start + 1)
        if j < 0:
            break
        s = score_from(j)
        if s is None:
            # pattern can't complete from here; later starts see a subset
            break
        if best is None or s > best:
            best = s
        i = j + 1
    if best is None:
        return 0.0
    return best / (n * n) * _NON_EXACT_SCALE


def jaro_winkler_score(a: str, b: str) -> float:
    """jarowinkler.go:57 — standard Jaro similarity + Winkler prefix
    boost (up to 4 chars, p=0.1)."""
    if a == b:
        return 1.0
    if not a or not b:
        return 0.0
    s1, s2 = (a, b) if len(a) <= len(b) else (b, a)
    l1, l2 = len(s1), len(s2)
    match_distance = max(l2 // 2 - 1, 0)
    s1m = [False] * l1
    s2m = [False] * l2
    matches = 0
    for i in range(l1):
        lo = max(0, i - match_distance)
        hi = min(i + match_distance + 1, l2)
        for j in range(lo, hi):
            if s2m[j] or s1[i] != s2[j]:
                continue
            s1m[i] = s2m[j] = True
            matches += 1
            break
    if matches == 0:
        return 0.0
    transpositions = 0
    k = 0
    for i in range(l1):
        if not s1m[i]:
            continue
        while not s2m[k]:
            k += 1
        if s1[i] != s2[k]:
            transpositions += 1
        k += 1
    m = float(matches)
    jaro = (m / l1 + m / l2 + (m - transpositions * 0.5) / m) / 3.0
    prefix = 0
    while prefix < min(4, l1, l2) and s1[prefix] == s2[prefix]:
        prefix += 1
    return jaro + prefix * 0.1 * (1.0 - jaro)


def build_search_filter(
    searches: list[str],
    fuzz_threshold: int = 0,
    fuzz_alg: str = "subsequence",
    case_sensitive: bool = True,
) -> Optional[Callable[[str], tuple[bool, float]]]:
    """search.go:627 buildSearchFilter: per-term filters OR-combined
    (best score wins, search_filters.go:276); subsequence prefix
    matches pin 1.0; jarowinkler = substring OR fuzzy-above-threshold."""
    terms = [s if case_sensitive else s.lower() for s in searches if s != ""]
    if not terms:
        return None
    threshold = fuzz_threshold / 100.0

    def one(term: str, value: str) -> tuple[bool, float]:
        if fuzz_alg == "subsequence":
            if value.startswith(term):
                return True, 1.0
            s = subsequence_score(term, value)
            return (s > 0 and s >= threshold), s
        ok, s = substring_score(term, value)
        if ok:
            return True, s
        if fuzz_threshold > 0:
            s = jaro_winkler_score(term, value)
            return s >= threshold, s
        return False, 0.0

    def accept(value: str) -> tuple[bool, float]:
        v = value if case_sensitive else value.lower()
        best = 0.0
        accepted = False
        for t in terms:
            ok, s = one(t, v)
            if not ok:
                continue
            accepted = True
            if s > best:
                best = s
            if best >= 1.0:
                return True, best
        return accepted, best

    return accept


def run_search(
    values: list[str],
    searches: list[str],
    limit: int = DEFAULT_LIMIT,
    batch_size: int = DEFAULT_BATCH_SIZE,
    fuzz_threshold: int = 0,
    fuzz_alg: str = "subsequence",
    case_sensitive: bool = True,
    include_score: bool = False,
    sort_by: str = "",
    sort_dir: str = "asc",
    result_key: str = "name",
) -> list[dict]:
    """Filter + score + order + paginate → the NDJSON line objects
    (batches then trailer), mirroring streamSearchResults + the
    searchBatch/searchTrailer shapes (search.go:125-140)."""
    f = build_search_filter(searches, fuzz_threshold, fuzz_alg, case_sensitive)
    scored: list[tuple[str, float]] = []
    for v in values:
        if f is None:
            scored.append((v, 1.0))
        else:
            ok, s = f(v)
            if ok:
                scored.append((v, s))
    # ordering (search.go:411 sortOrdering): score → desc (alpha
    # tie-break), alpha asc by default / dsc on request
    if sort_by == "score":
        scored.sort(key=lambda x: (-x[1], x[0]))
    else:
        scored.sort(key=lambda x: x[0], reverse=(sort_dir == "dsc"))
    has_more = len(scored) > limit
    scored = scored[:limit]

    def rec(v: str, s: float) -> dict:
        out = {result_key: v}
        if include_score:
            out["score"] = s
        return out

    lines: list[dict] = []
    batch = [rec(v, s) for v, s in scored[:batch_size]]
    lines.append({"results": batch})  # first batch always emits
    for i in range(batch_size, len(scored), batch_size):
        lines.append(
            {"results": [rec(v, s) for v, s in scored[i:i + batch_size]]}
        )
    lines.append({"status": "success", "has_more": has_more})
    return lines
