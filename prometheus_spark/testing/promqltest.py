"""Python port of the promqltest scripting-language *runner*.

The reference ships an engine-independent golden corpus
(promql/promqltest/testdata/, spec promql/promqltest/README.md — "can be
run against any PromQL engine implementation").  This module implements
the same scripting language so those files run unmodified against the
Spark engine; the test files themselves stay in the reference tree and are
read at test time.

Runner reference: promql/promqltest/test.go (re-derived, not translated).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field
from typing import Optional

from prometheus_spark.parser.ast import MatchType, VectorSelector
from prometheus_spark.parser.lexer import parse_duration_ms
from prometheus_spark.parser.parser import Parser

EPSILON = 1e-6  # almostEqual tolerance used by the reference runner


class SkipCommand(Exception):
    """Raised for constructs this engine doesn't support yet."""


@dataclass
class Series:
    labels: dict[str, str]
    points: list  # list of (idx, float | 'stale' | None)
    # per-idx start-timestamp offsets in ms relative to the sample's own
    # timestamp (None = unset); from promqltest @st lines
    st_offsets: dict | None = None


@dataclass
class LoadCmd:
    interval_ms: int
    series: list[Series]
    dropped_names: list[str] = field(default_factory=list)
    with_nhcb: bool = False


@dataclass
class ClearCmd:
    pass


@dataclass
class EvalCmd:
    kind: str  # 'instant' | 'range'
    query: str
    line: int
    time_ms: int = 0
    start_ms: int = 0
    end_ms: int = 0
    step_ms: int = 0
    expect_fail: bool = False
    expect_ordered: bool = False
    expected: list[Series] = field(default_factory=list)
    is_string: bool = False
    expected_string: str = ""
    skip_reason: str = ""
    # "expect range vector from A to B step C" grid (ms) — expected
    # values align to THIS grid and the result is a matrix of raw
    # samples (promqltest.go rangeVector expectation)
    matrix_grid: "Optional[tuple[int, int, int]]" = None


def parse_series_labels(text: str) -> dict[str, str]:
    if text.strip() in ("{}", ""):
        return {}
    node = Parser(text).parse_vector_selector(None) if text.startswith("{") else None
    if node is None:
        p = Parser(text)
        name = p.next().text
        node = p.parse_vector_selector(name)
    labels = {}
    for m in node.matchers:
        if m.type != MatchType.EQ:
            raise ValueError(f"expected equality matcher in series spec: {text}")
        labels[m.name] = m.value
    return labels


_NUM_RE = r"-?(?:Inf|NaN|\d+(?:\.\d+)?(?:[eE][+-]?\d+)?|\.\d+)"
_EXPAND_RE = re.compile(rf"^({_NUM_RE})(?:([+-])({_NUM_RE}))?x(\d+)$", re.IGNORECASE)
_GAP_EXPAND_RE = re.compile(r"^_x(\d+)$")


def _num(s: str) -> float:
    ls = s.lower()
    if ls in ("inf", "+inf"):
        return float("inf")
    if ls == "-inf":
        return float("-inf")
    if ls == "nan":
        return float("nan")
    return float(s)


def _point_tokens(spec: str) -> list[str]:
    """Split a points spec on whitespace, keeping ``{{...}}`` histogram
    literals (which contain spaces) together with any ``xN`` suffix."""
    out, i, n = [], 0, len(spec)
    while i < n:
        if spec[i].isspace():
            i += 1
            continue
        if spec.startswith("{{", i):
            end = spec.find("}}", i)
            if end == -1:
                raise ValueError(f"unterminated histogram literal: {spec[i:]}")
            end += 2
            if spec.startswith("+{{", end):  # incrementing form a+bxN
                end = spec.find("}}", end)
                if end == -1:
                    raise ValueError(f"unterminated histogram literal: {spec[i:]}")
                end += 2
            while end < n and not spec[end].isspace():
                end += 1  # attach xN suffix
            out.append(spec[i:end])
            i = end
            continue
        j = i
        while j < n and not spec[j].isspace():
            j += 1
        out.append(spec[i:j])
        i = j
    return out


_HIST_REPEAT_RE = re.compile(r"^(\{\{.*\}\})(?:x(\d+))?$", re.DOTALL)
_HIST_INCR_RE = re.compile(r"^(\{\{.*?\}\})\+(\{\{.*?\}\})x(\d+)$", re.DOTALL)


def expand_points(spec: str) -> list:
    """``0+10x10`` → values; ``_`` gaps → None; ``stale`` markers;
    ``{{...}}xN`` native-histogram literals (dicts).

    Returns list of (float | None | 'stale' | dict), one slot per tick.
    """
    from prometheus_spark.testing.histogram_literal import parse_histogram_literal

    out = []
    for tok in _point_tokens(spec):
        if tok == "_":
            out.append(None)
            continue
        if tok == "stale":
            out.append("stale")
            continue
        m = _GAP_EXPAND_RE.match(tok)
        if m:
            out.extend([None] * int(m.group(1)))
            continue
        if tok.startswith("{{"):
            im = _HIST_INCR_RE.match(tok)
            if im:
                # a+bxN: step i = a + i·b, via the histogram algebra
                from prometheus_spark.model.histogram import from_row

                a = from_row(parse_histogram_literal(im.group(1)))
                b = from_row(parse_histogram_literal(im.group(2)))
                cur = a
                for i in range(int(im.group(3)) + 1):
                    out.append(cur.copy().compact().to_row())
                    nxt = cur.copy()
                    nxt.add(b)
                    nxt.counter_reset_hint = cur.counter_reset_hint
                    cur = nxt
                continue
            hm = _HIST_REPEAT_RE.match(tok)
            if not hm:
                raise SkipCommand(f"unsupported histogram expansion: {tok[:40]}")
            h = parse_histogram_literal(hm.group(1))
            reps = int(hm.group(2)) + 1 if hm.group(2) else 1
            out.extend([dict(h) for _ in range(reps)])
            continue
        m = _EXPAND_RE.match(tok)
        if m:
            a = _num(m.group(1))
            sign = -1.0 if m.group(2) == "-" else 1.0
            b = _num(m.group(3)) if m.group(3) is not None else 0.0
            n = int(m.group(4))
            out.extend([a + sign * b * i for i in range(n + 1)])
            continue
        out.append(_num(tok))
    return out


_ST_DUR = r"(?:0|(?:\d+(?:ms|s|m|h|d|w|y))+)"
_ST_ITEM_RE = re.compile(
    rf"^(?P<bs>[+-]?)(?P<base>{_ST_DUR})"
    rf"(?:(?P<sign>[+-])(?P<delta>{_ST_DUR})x(?P<n>\d+)|x(?P<reps>\d+))?$"
)


def _st_dur_ms(sign: str, tok: str) -> int:
    v = 0 if tok == "0" else parse_duration_ms(tok)
    return -v if sign == "-" else v


def expand_st_sequence(spec: str) -> list:
    """promqltest @st sequence → per-slot ms offsets (None = omitted).

    Grammar (promqltest/test.go parseSTSequence): ``_``, ``_xN``,
    ``<dur>``, ``<dur>xN`` (N+1 slots), ``<dur>±<dur>xN`` (N+1 slots
    stepping by ±delta)."""
    out: list = []
    for tok in spec.split():
        if tok == "_":
            out.append(None)
            continue
        m = _GAP_EXPAND_RE.match(tok)
        if m:
            out.extend([None] * int(m.group(1)))
            continue
        m = _ST_ITEM_RE.match(tok)
        if not m:
            raise ValueError(f"invalid @st sequence item: {tok!r}")
        base = _st_dur_ms(m.group("bs"), m.group("base"))
        if m.group("reps") is not None:
            out.extend([base] * (int(m.group("reps")) + 1))
        elif m.group("n") is not None:
            delta = _st_dur_ms(m.group("sign"), m.group("delta"))
            out.extend([base + delta * i for i in range(int(m.group("n")) + 1)])
        else:
            out.append(base)
    return out


def _parse_time_ms(tok: str) -> int:
    neg = tok.startswith("-")
    if neg:
        tok = tok[1:]
    v = parse_duration_ms(tok)
    return -v if neg else v


_EVAL_INSTANT = re.compile(r"^eval(?:_(fail|warn|info|ordered))?\s+instant\s+at\s+(\S+)\s+(.*)$")
_EVAL_RANGE = re.compile(
    r"^eval(?:_(fail|warn|info|ordered))?\s+range\s+from\s+(\S+)\s+to\s+(\S+)\s+step\s+(\S+)\s+(.*)$"
)


def parse_test_text(text: str) -> list:
    """Test script → command list.  Raises SkipCommand inside commands that
    use unsupported constructs (callers decide granularity)."""
    cmds: list = []
    lines = text.split("\n")
    i = 0
    n = len(lines)

    def is_indented(line: str) -> bool:
        return bool(line) and (line[0] in " \t")

    while i < n:
        raw = lines[i]
        line = raw.split("#", 1)[0].rstrip() if not _in_string_comment(raw) else raw.rstrip()
        stripped = line.strip()
        if not stripped:
            i += 1
            continue
        if stripped.startswith("load"):
            parts = stripped.split()
            interval = parse_duration_ms(parts[1])
            with_nhcb = parts[0] == "load_with_nhcb"
            series = []
            dropped: list[str] = []
            pending_st: tuple | None = None  # (labels, offsets)
            i += 1
            while i < n and is_indented(lines[i]):
                body = lines[i].split("#", 1)[0].strip()
                i += 1
                if not body:
                    continue
                sel_part = body.split()[0] if body.split() else ""
                if sel_part.endswith("@st"):
                    # start-timestamp definition for the NEXT series line
                    # with the same labels (promqltest/test.go:349)
                    sel, seq = _split_series_line(body)
                    if sel.endswith("@st"):  # bare metric name form
                        sel = sel[: -len("@st")]
                    elif seq.startswith("@st"):  # selector-with-braces form
                        seq = seq[len("@st"):].strip()
                    st_labels = parse_series_labels(sel)
                    pending_st = (st_labels, expand_st_sequence(seq))
                    continue
                try:
                    ser = _parse_series_line(body)
                    if pending_st is not None:
                        if pending_st[0] != ser.labels:
                            raise ValueError(
                                "@st metric does not match the following sample line"
                            )
                        ser.st_offsets = dict(enumerate(pending_st[1]))
                        pending_st = None
                    series.append(ser)
                except SkipCommand:
                    # e.g. native-histogram series — dropped; evals touching
                    # the metric are skipped by the runner
                    pending_st = None
                    name = re.match(r"[a-zA-Z_:][a-zA-Z0-9_:]*", body)
                    if name:
                        dropped.append(name.group())
            cmds.append(LoadCmd(interval, series, dropped, with_nhcb))
            continue
        if stripped == "clear":
            cmds.append(ClearCmd())
            i += 1
            continue
        m = _EVAL_INSTANT.match(stripped)
        m2 = _EVAL_RANGE.match(stripped) if not m else None
        if m or m2:
            cmd = EvalCmd(kind="instant" if m else "range", query="", line=i + 1)
            if m:
                mod, t, q = m.group(1), m.group(2), m.group(3)
                cmd.time_ms = _parse_time_ms(t)
                cmd.start_ms = cmd.end_ms = cmd.time_ms
                cmd.step_ms = 1
                cmd.query = q
            else:
                mod, a, b, s, q = (
                    m2.group(1), m2.group(2), m2.group(3), m2.group(4), m2.group(5)
                )
                cmd.start_ms = _parse_time_ms(a)
                cmd.end_ms = _parse_time_ms(b)
                cmd.step_ms = _parse_time_ms(s)
                cmd.query = q
            if mod == "fail":
                cmd.expect_fail = True
            if mod == "ordered":
                cmd.expect_ordered = True
            i += 1
            while i < n and is_indented(lines[i]):
                body = lines[i].split("#", 1)[0].strip()
                i += 1
                if not body:
                    continue
                if body.startswith("expect "):
                    kind = body.split()[1]
                    if kind == "fail":
                        cmd.expect_fail = True
                    elif kind == "ordered":
                        cmd.expect_ordered = True
                    elif kind.startswith("string"):
                        cmd.is_string = True
                        ms = re.search(r'"(.*)"|`(.*)`', body)
                        if ms:  # note "" is falsy but a valid expectation
                            g1, g2 = ms.group(1), ms.group(2)
                            cmd.expected_string = g1 if g1 is not None else (g2 or "")
                    elif kind in ("info", "warn", "no_info", "no_warn"):
                        pass  # annotations not modeled yet
                    elif kind == "range":
                        mg = re.search(
                            r"range\s+vector\s+from\s+(\S+)\s+to\s+(\S+)\s+step\s+(\S+)",
                            body,
                        )
                        if mg:
                            cmd.matrix_grid = (
                                _parse_time_ms(mg.group(1)),
                                _parse_time_ms(mg.group(2)),
                                _parse_time_ms(mg.group(3)),
                            )
                        else:
                            cmd.skip_reason = f"unparsable expect range: {body}"
                    continue
                try:
                    cmd.expected.append(_parse_series_line(body))
                except SkipCommand as e:
                    cmd.skip_reason = str(e)
            cmds.append(cmd)
            continue
        raise ValueError(f"unparsable test line {i + 1}: {raw!r}")
    return cmds


def _in_string_comment(line: str) -> bool:
    # crude: lines with quotes keep their # (rare in corpus)
    return '"' in line.split("#")[0] if "#" in line else False


def _split_series_line(body: str) -> tuple[str, str]:
    """Split ``metric{l="v"} points...`` respecting quotes inside label
    values (which may contain braces/spaces)."""
    i, n = 0, len(body)
    while i < n and not body[i].isspace() and body[i] != "{":
        i += 1
    if i < n and body[i] == "{":
        depth = 0
        quote = None
        while i < n:
            c = body[i]
            if quote:
                if c == "\\":
                    i += 2
                    continue
                if c == quote:
                    quote = None
            elif c in "\"'`":
                quote = c
            elif c == "{":
                depth += 1
            elif c == "}":
                depth -= 1
                if depth == 0:
                    i += 1
                    break
            i += 1
    return body[:i], body[i:].strip()


_SERIES_NAME_RE = re.compile(r"^[a-zA-Z_:][a-zA-Z0-9_:]*(\{.*\})?$", re.DOTALL)


def _parse_series_line(body: str) -> Series:
    sel, points = _split_series_line(body)
    if not sel:
        raise ValueError(f"unparsable series line: {body!r}")
    is_labeled = (sel.startswith("{") and not sel.startswith("{{")) or (
        _SERIES_NAME_RE.match(sel) and sel.lower() not in ("inf", "nan", "stale")
    )
    if not is_labeled:
        # scalar expectation — bare value(s), empty label set
        return Series({}, list(enumerate(expand_points(body))))
    labels = parse_series_labels(sel)
    pts = expand_points(points)
    return Series(labels, list(enumerate(pts)))


def _synthesize_nhcb(cmd: LoadCmd) -> list:
    """load_with_nhcb: classic `_bucket` series additionally load as native
    histograms with custom buckets (schema −53) under the base name."""
    from prometheus_spark.testing.histogram_literal import nhcb_from_buckets

    groups: dict = {}
    sums: dict = {}
    counts: dict = {}
    for s in cmd.series:
        name = s.labels.get("__name__", "")
        rest = tuple(sorted((k, v) for k, v in s.labels.items() if k not in ("__name__", "le")))
        if name.endswith("_bucket") and "le" in s.labels:
            base = name[: -len("_bucket")]
            le = s.labels["le"]
            try:
                lev = float("inf") if le in ("+Inf", "inf") else float(le)
            except ValueError:
                continue
            for idx, v in s.points:
                if v is None or isinstance(v, (str, dict)):
                    continue
                groups.setdefault((base, rest), {}).setdefault(idx, []).append((lev, float(v)))
        elif name.endswith("_sum"):
            for idx, v in s.points:
                if isinstance(v, float):
                    sums.setdefault((name[:-4], rest), {})[idx] = v
        elif name.endswith("_count"):
            for idx, v in s.points:
                if isinstance(v, float):
                    counts.setdefault((name[:-6], rest), {})[idx] = v
    out = []
    for (base, rest), by_idx in groups.items():
        for idx, le_counts in by_idx.items():
            total = counts.get((base, rest), {}).get(idx)
            ssum = sums.get((base, rest), {}).get(idx, 0.0)
            h = nhcb_from_buckets(le_counts, total, ssum)
            labels = dict(rest)
            labels["__name__"] = base
            out.append((labels, idx * cmd.interval_ms, h))
    return out


@dataclass
class TestStats:
    total: int = 0
    passed: int = 0
    failed: int = 0
    skipped: int = 0
    failures: list = field(default_factory=list)

    def merge(self, other: "TestStats"):
        self.total += other.total
        self.passed += other.passed
        self.failed += other.failed
        self.skipped += other.skipped
        self.failures.extend(other.failures)


#: evals unioned into one Spark job when ``batch_evals > 1``.  MEASURED
#: on local[32]/4 workers: batching at 8 made the full sweep SLOWER
#: (283s vs 204s) — the wide thread pool already hides per-job
#: scheduling, and the k-way union adds Catalyst analysis — so the
#: default stays un-batched; the knob exists for low-parallelism
#: environments where per-job overhead dominates.
DEFAULT_BATCH_EVALS = 1


def _batch_eligible(cmd: EvalCmd) -> bool:
    return (
        not cmd.is_string
        and cmd.matrix_grid is None
        and not cmd.expect_fail
    )


def _eval_batch(tasks: list) -> list[tuple[str, str | None]]:
    """Evaluate several vector evals against one engine in a SINGLE
    Spark job: tag each range_query frame, union them, collect once,
    and dispatch rows back to per-eval comparison.  The corpus wall is
    dominated by per-job scheduling on tiny data — k evals per job
    divides that overhead by k.  Any error anywhere in the batch falls
    back to individual evaluation, so semantics (expected failures,
    runtime guards, per-eval messages) are exactly the un-batched
    path's."""
    from pyspark.sql import functions as F

    try:
        frames = []
        for i, (engine, cmd) in enumerate(tasks):
            df = engine.range_query(
                cmd.query, cmd.start_ms, cmd.end_ms, cmd.step_ms
            )
            cols = ["labels", "t", "value"] + (
                ["hist"] if "hist" in df.columns else []
            )
            frames.append(
                df.select(F.lit(i).alias("__eval"), *cols)
            )
        union = frames[0]
        for f in frames[1:]:
            union = union.unionByName(f, allowMissingColumns=True)
        has_hist = "hist" in union.columns
        by_eval: dict[int, list] = {i: [] for i in range(len(tasks))}
        for r in union.collect():
            by_eval[r["__eval"]].append(r)
    except Exception:
        # build or execute failed somewhere in the union — isolate
        return [_eval_one(e, c) for e, c in tasks]

    out: list[tuple[str, str | None]] = []
    for i, (engine, cmd) in enumerate(tasks):
        try:
            _check_vector_result(cmd, by_eval[i], has_hist)
            out.append(("pass", None))
        except AssertionError as e:
            out.append(
                ("fail", f"line {cmd.line}: {cmd.query}\n  {e}")
            )
        except Exception:
            out.append(_eval_one(engine, cmd))
    return out


def _eval_one(engine, cmd: EvalCmd) -> tuple[str, str | None]:
    """Run one eval; returns (outcome, failure_message)."""
    try:
        _run_eval(engine, cmd)
        return "pass", None
    except SkipCommand:
        return "skip", None
    except AssertionError as e:
        return "fail", f"line {cmd.line}: {cmd.query}\n  {e}"
    except Exception as e:  # noqa: BLE001 — engine error vs expect_fail
        if cmd.expect_fail:
            return "pass", None
        return "fail", (
            f"line {cmd.line}: {cmd.query}\n  error: {type(e).__name__}: {str(e)[:300]}"
        )


def run_test_text(
    spark,
    text: str,
    max_evals: int | None = None,
    query_filter=None,
    parallel_evals: int = 1,
    eval_offset: int = 0,
    batch_evals: int = DEFAULT_BATCH_EVALS,
) -> TestStats:
    """Execute a promqltest script against the Spark engine.

    ``parallel_evals > 1`` runs the evals between data-loading commands
    concurrently against the shared SparkSession — each eval is a small
    independent read-only job, so concurrent submission hides Spark's
    per-job scheduling latency (the dominant cost on tiny corpus data).

    ``eval_offset``/``max_evals`` select a SLICE of the file's eval
    commands (load commands always run — later evals depend on them):
    indices [offset, offset+max) over every EvalCmd in file order, so
    disjoint slices partition the file exactly — the corpus sweep splits
    the largest files across workers this way.
    """
    from concurrent.futures import ThreadPoolExecutor

    from prometheus_spark.engine import PromQLEngine
    from prometheus_spark.storage import samples_from_rows

    stats = TestStats()
    try:
        cmds = parse_test_text(text)
    except SkipCommand:
        stats.skipped += 1
        return stats

    # Phase 1: split the script into independent eval runs — each run is a
    # snapshot of the loaded data plus the consecutive evals that see it.
    # Runs share nothing, so ALL evals across the whole file can fan out
    # into one global pool (block-local pooling caps parallelism at the
    # ~5-8 evals between loads that corpus files typically have).
    rows: list = []
    stale_rows: list = []
    dropped_names: set[str] = set()
    runs: list[tuple[list, list, list]] = []
    open_run = False
    n_evals = 0
    eval_index = 0
    for cmd in cmds:
        if isinstance(cmd, ClearCmd):
            rows, stale_rows = [], []
            dropped_names = set()
            open_run = False
            continue
        if isinstance(cmd, LoadCmd):
            dropped_names.update(cmd.dropped_names)
            for s in cmd.series:
                for idx, v in s.points:
                    t = idx * cmd.interval_ms
                    if v is None:
                        continue
                    if isinstance(v, str) and v == "stale":
                        stale_rows.append((s.labels, t))
                    else:
                        st_off = (s.st_offsets or {}).get(idx)
                        st = t + st_off if st_off is not None else None
                        rows.append((s.labels, t, v, st))
            if cmd.with_nhcb:
                rows.extend(_synthesize_nhcb(cmd))
            open_run = False
            continue
        # EvalCmd — slice selection first, so each eval (including ones
        # later counted as skipped) belongs to exactly one slice
        eval_index += 1
        if eval_index - 1 < eval_offset:
            continue
        if max_evals is not None and n_evals >= max_evals:
            break
        if query_filter is not None and not query_filter(cmd.query):
            continue
        if cmd.skip_reason:
            stats.skipped += 1
            continue
        if dropped_names and any(n in cmd.query for n in dropped_names):
            stats.skipped += 1
            continue
        if not open_run:
            runs.append((list(rows), list(stale_rows), []))
            open_run = True
        runs[-1][2].append(cmd)
        n_evals += 1

    # Phase 2: one engine per run (driver-side createDataFrame, cheap),
    # then every (engine, eval) pair goes through the shared pool.
    # Each run's samples frame is cached for its evals and unpersisted
    # once its LAST eval completes — a long corpus file has hundreds of
    # load blocks, and never releasing them accumulates cached blocks +
    # listener/codegen state until the worker JVM thrashes in GC.
    tasks: list[tuple] = []
    pending: dict[int, int] = {}  # id(engine) → evals left
    engines: dict[int, object] = {}
    for run_rows, run_stale, evals in runs:
        # localCheckpoint truncates the lineage to an RDD scan:
        # createDataFrame inlines every sample row into a LocalRelation,
        # and engine plans reference the storage frame MANY times (flag
        # branches, union halves) — each reference COPIES the relation,
        # so analysis/canonicalization cost scaled with data × fan-out
        # (the histograms.test "session pressure" GC storms).  A LogicalRDD
        # leaf is O(1) to duplicate.
        samples = samples_from_rows(spark, run_rows, run_stale).localCheckpoint(
            eager=False
        )
        # plan_cache_size=0: test queries never repeat, so a cache is pure
        # retention — each cached classic-histogram eval pins a huge
        # analyzed tree in the JVM, and a 91-eval load block retaining all
        # of them GC-stormed the worker (the round-10 histograms.test
        # session-pressure wall; root-caused round 11).
        engine = PromQLEngine(
            spark, samples, kahan=True, ordered=False, plan_cache_size=0
        )
        tasks.extend((engine, c) for c in evals)
        pending[id(engine)] = len(evals)
        engines[id(engine)] = samples

    import threading as _threading

    _done_lock = _threading.Lock()

    def _mark_done(engine, n: int) -> None:
        with _done_lock:
            left = pending.get(id(engine), 0) - n
            pending[id(engine)] = left
            if left <= 0:
                frame = engines.pop(id(engine), None)
                if frame is not None:
                    frame.unpersist(blocking=False)
                engine.release_series_dim()

    # Batch consecutive eligible evals sharing an engine into unioned
    # single-job units; everything else stays a singleton.  Units then
    # fan out across the shared pool as before.
    units: list[list] = []
    for engine, cmd in tasks:
        if (
            batch_evals > 1
            and _batch_eligible(cmd)
            and units
            and len(units[-1]) < batch_evals
            and units[-1][0][0] is engine
            and _batch_eligible(units[-1][0][1])
        ):
            units[-1].append((engine, cmd))
        else:
            units.append([(engine, cmd)])

    from prometheus_spark import pygc

    def run_unit(unit: list) -> list[tuple[str, str | None]]:
        try:
            if len(unit) == 1:
                e, c = unit[0]
                return [_eval_one(e, c)]
            return _eval_batch(unit)
        finally:
            _mark_done(unit[0][0], len(unit))
            # each eval's py4j handles are cycle-garbage from birth
            # (see pygc module docstring); a long corpus file at
            # parallel_evals=24 pins ~50 MB of JVM plan+broadcast
            # state per uncollected eval — collect on a deterministic
            # completion cadence
            pygc.tick(len(unit))

    if parallel_evals > 1 and len(units) > 1:
        with ThreadPoolExecutor(parallel_evals) as pool:
            results = [r for rs in pool.map(run_unit, units) for r in rs]
    else:
        results = [r for u in units for r in run_unit(u)]
    for outcome, msg in results:
        if outcome == "pass":
            stats.total += 1
            stats.passed += 1
        elif outcome == "skip":
            stats.skipped += 1
        else:
            stats.total += 1
            stats.failed += 1
            stats.failures.append(msg)
    return stats


def _run_eval(engine, cmd: EvalCmd) -> None:
    if cmd.is_string:
        # string literal result (promqltest.go String case)
        from prometheus_spark.parser import parse_expr
        from prometheus_spark.parser.ast import ParenExpr, StringLiteral

        node = parse_expr(cmd.query)
        while isinstance(node, ParenExpr):
            node = node.expr
        if not isinstance(node, StringLiteral):
            raise AssertionError(
                f"expected string result, got {type(node).__name__}"
            )
        if node.value != cmd.expected_string:
            raise AssertionError(
                f"want string {cmd.expected_string!r}, got {node.value!r}"
            )
        return
    if cmd.matrix_grid is not None:
        _run_matrix_eval(engine, cmd)
        return
    result = engine.range_query(cmd.query, cmd.start_ms, cmd.end_ms, cmd.step_ms)
    got_rows = result.collect()
    if cmd.expect_fail:
        raise AssertionError("expected query to fail, but it succeeded")
    _check_vector_result(cmd, got_rows, "hist" in result.columns)


def _check_vector_result(cmd: EvalCmd, got_rows, has_hist: bool) -> None:
    """Compare collected rows against the eval's expectation — the
    comparison half of :func:`_run_eval`, shared with the batched path."""
    # expected: map sig -> {step_idx: value}
    num_steps = (cmd.end_ms - cmd.start_ms) // cmd.step_ms + 1
    expected: dict[tuple, dict[int, float]] = {}
    exp_labels: dict[tuple, dict] = {}
    for s in cmd.expected:
        key = tuple(sorted(s.labels.items()))
        exp_labels[key] = s.labels
        slots = expected.setdefault(key, {})
        for idx, v in s.points:
            if v is None or (isinstance(v, str) and v == "stale"):
                continue
            if cmd.kind == "instant":
                slots[0] = v
            else:
                slots[idx] = v

    got: dict[tuple, dict[int, float]] = {}
    for r in got_rows:
        labels = dict(r["labels"])
        key = tuple(sorted(labels.items()))
        step_idx = (r["t"] - cmd.start_ms) // cmd.step_ms
        val = r["value"]
        if val is None and has_hist and r["hist"] is not None:
            val = r["hist"].asDict(recursive=True)
        got.setdefault(key, {})[step_idx] = val

    def fmt(key):
        return "{" + ",".join(f'{k}="{v}"' for k, v in key) + "}"

    missing = [k for k in expected if k not in got]
    extra = [k for k in got if k not in expected]
    if missing or extra:
        raise AssertionError(
            f"series mismatch: missing={[fmt(k) for k in missing]} "
            f"unexpected={[fmt(k) for k in extra]} "
            f"(got {len(got)}, want {len(expected)})"
        )
    for key, slots in expected.items():
        gslots = got[key]
        if cmd.kind == "instant":
            want = slots.get(0)
            have = gslots.get(0)
            if not _values_equal(want, have):
                raise AssertionError(f"{fmt(key)}: want {want}, got {have}")
        else:
            for idx, want in slots.items():
                have = gslots.get(idx)
                if have is None:
                    raise AssertionError(f"{fmt(key)} step {idx}: want {want}, got no sample")
                if not _values_equal(want, have):
                    raise AssertionError(f"{fmt(key)} step {idx}: want {want}, got {have}")
            for idx in gslots:
                if idx not in slots:
                    raise AssertionError(
                        f"{fmt(key)} step {idx}: unexpected sample {gslots[idx]}"
                    )


def _hist_equal(want: dict, have) -> bool:
    """Compare an expected histogram literal with a result histogram —
    both sides Compact(0)'d first, exactly like the reference runner
    (promqltest/test.go:1319).  counter_reset_hint is never checked (the
    literal parser can't distinguish unset from unknown)."""
    if not isinstance(have, dict):
        return False
    from prometheus_spark.model.histogram import from_row

    w, h = from_row(want).compact(), from_row(have).compact()
    if w.schema != h.schema:
        return False
    for a, b in (
        (w.count, h.count),
        (w.sum, h.sum),
        (w.zero_count, h.zero_count),
        (w.zero_threshold, h.zero_threshold),
    ):
        if not _almost_equal(a, b):
            return False
    if len(w.custom_values) != len(h.custom_values) or any(
        not _almost_equal(x, y) for x, y in zip(w.custom_values, h.custom_values)
    ):
        return False
    for wa, ha in ((w.pos_spans, h.pos_spans), (w.neg_spans, h.neg_spans)):
        if [(int(o), int(n)) for o, n in wa] != [(int(o), int(n)) for o, n in ha]:
            return False
    for wa, ha in ((w.pos_buckets, h.pos_buckets), (w.neg_buckets, h.neg_buckets)):
        if len(wa) != len(ha) or any(not _almost_equal(x, y) for x, y in zip(wa, ha)):
            return False
    return True


def _values_equal(want, have) -> bool:
    if isinstance(want, dict) or isinstance(have, dict):
        return isinstance(want, dict) and _hist_equal(want, have)
    return _almost_equal(want, have)


def _almost_equal(a, b) -> bool:
    if a is None or b is None:
        return False
    if math.isnan(a):
        return math.isnan(b)
    if math.isinf(a) or math.isinf(b):
        return a == b
    if a == b:
        return True
    diff = abs(a - b)
    if abs(a) <= EPSILON or diff < EPSILON:
        return diff <= EPSILON
    return diff / (abs(a) + abs(b)) <= EPSILON


def _run_matrix_eval(engine, cmd: EvalCmd) -> None:
    """Instant query returning a range vector, compared sample-exact
    against the ``expect range vector from A to B step C`` grid
    (promqltest.go matrix expectation): samples must exist exactly at
    the expected grid slots — `_` asserts absence."""
    result = engine.instant_query(cmd.query, cmd.time_ms)
    got_rows = result.collect()
    if cmd.expect_fail:
        raise AssertionError("expected query to fail, but it succeeded")
    g0, _g1, gs = cmd.matrix_grid

    expected: dict[tuple, dict[int, object]] = {}
    for s in cmd.expected:
        key = tuple(sorted(s.labels.items()))
        slots = expected.setdefault(key, {})
        for idx, v in s.points:
            if v is None or (isinstance(v, str) and v == "stale"):
                continue
            slots[g0 + idx * gs] = v

    got: dict[tuple, dict[int, object]] = {}
    has_hist = "hist" in result.columns
    for r in got_rows:
        key = tuple(sorted(dict(r["labels"]).items()))
        val = r["value"]
        if val is None and has_hist and r["hist"] is not None:
            val = r["hist"].asDict(recursive=True)
        got.setdefault(key, {})[r["t"]] = val

    def fmt(key):
        return "{" + ",".join(f'{k}="{v}"' for k, v in key) + "}"

    missing = [k for k in expected if k not in got]
    extra = [k for k in got if k not in expected]
    if missing or extra:
        raise AssertionError(
            f"matrix series mismatch: missing={[fmt(k) for k in missing]} "
            f"unexpected={[fmt(k) for k in extra]}"
        )
    for key, slots in expected.items():
        gslots = got[key]
        for t, want in slots.items():
            if t not in gslots:
                raise AssertionError(f"{fmt(key)} t={t}: want {want}, got no sample")
            if not _values_equal(want, gslots[t]):
                raise AssertionError(f"{fmt(key)} t={t}: want {want}, got {gslots[t]}")
        for t in gslots:
            if t not in slots:
                raise AssertionError(f"{fmt(key)} t={t}: unexpected sample {gslots[t]}")
