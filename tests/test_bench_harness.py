"""Bench-harness invariants (r15, from the r14 median-collapse
diagnosis): the between-sample block release must actually release
localCheckpoint blocks, every headline key must be registered, and the
emitted JSON must keep the headline facts LAST so the driver's
2000-char stdout tail always captures them."""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("bench", mod)
    spec.loader.exec_module(mod)
    return mod


def test_release_persisted_drops_local_checkpoints(spark):
    """q_llm_semdedup_kmeans pins a localCheckpoint of the embedding
    corpus per invocation; the r14 bench accumulated those across
    warm-up + 3 repeats into an allocator-pressure GC stall (median
    2.7x over min). The release helper must drop exactly that state:
    local checkpoints persist their RDD, so they appear in — and must
    vanish from — getPersistentRDDs."""
    bench = _load_bench()
    df = spark.range(10_000).localCheckpoint(eager=True)
    assert df.count() == 10_000
    assert spark.sparkContext._jsc.getPersistentRDDs().size() > 0
    bench._release_persisted(spark)
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == 0


def test_headline_keys_all_registered():
    from okera_trino_spark.registry import load_all_queries

    bench = _load_bench()
    specs = load_all_queries()
    missing = [n for n in bench.HEADLINE if n not in specs]
    assert not missing, f"headline keys not registered: {missing}"


def test_debug_knob_typos_fail_before_spark(tmp_path):
    """r15 review: a typo'd SPARK_GRAFT_BENCH_SKIP (or --drift /
    --drift-n) must fail loudly BEFORE any JVM spins up or timed work
    runs — a silent no-op would let a bisect measure the wrong
    configuration while its artifact claims otherwise. Subprocess
    checks pin both the exit code and the pre-Spark timing (a JVM
    spin-up would blow the timeout)."""
    import os
    import subprocess

    env = {**os.environ, "SPARK_GRAFT_BENCH_SKIP": "q_llm_typo"}
    p = subprocess.run(
        [sys.executable, str(REPO / "bench.py")], env=env,
        capture_output=True, text=True, timeout=60)
    assert p.returncode != 0
    assert "q_llm_typo" in (p.stderr + p.stdout)

    p = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "scale_probe.py"),
         "--drift", "q_no_such_key"],
        capture_output=True, text=True, timeout=60)
    assert p.returncode != 0
    assert "q_no_such_key" in (p.stderr + p.stdout)

    p = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "scale_probe.py"),
         "--drift", "q_llm_kmeans", "--drift-n", "1"],
        capture_output=True, text=True, timeout=60)
    assert p.returncode != 0
    assert "--drift-n" in (p.stderr + p.stdout)


def test_bench_json_tail_keeps_headline_facts():
    """The driver archives only the LAST 2000 chars of bench stdout;
    r14's artifact cut off the medians head and the total. Pin the
    contract structurally: the source emits value/value_min/
    host_factor/degrade_top only after the bulky per-key dicts, so
    any 2000-char tail of the one-line JSON contains them."""
    src = (REPO / "bench.py").read_text()
    region = src[src.index("out = {"):]  # the dict-construction block
    order = ['"samples"', '"queries"', '"queries_min"', '"value"',
             '"value_min"', '"host_factor"', '"degrade_top"']
    idx = [region.index(k) for k in order]
    assert idx == sorted(idx), (
        "bench.py must build the output dict with per-key bulk first "
        f"and headline facts last; found order {list(zip(order, idx))}")


def test_bench_stdout_tail_parses_end_to_end(tmp_path):
    """r15 verdict item 6 (r16): the driver archives the LAST 2000
    chars of bench stdout and parses the summary JSON from it. Run the
    real CLI as a subprocess (two fast keys at sf0.001 via the skip
    knob, so the run stays test-sized) and assert the contract
    end-to-end: exit 0, stdout's last non-empty line is the complete
    JSON document, every headline fact lands inside the 2000-char
    tail, and the per-key bulk precedes the facts in the emitted text
    (so a future verbose key pushes bulk, not facts, off the tail)."""
    import json
    import os
    import subprocess

    bench = _load_bench()
    keep = {"q_union_all", "q_fn_string"}
    env = {
        **os.environ,
        "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.001",
        "SPARK_GRAFT_BENCH_SKIP": ",".join(
            n for n in bench.HEADLINE if n not in keep),
    }
    p = subprocess.run(
        [sys.executable, str(REPO / "bench.py")], env=env,
        capture_output=True, text=True, timeout=300)
    assert p.returncode == 0, p.stderr[-2000:]
    line = [ln for ln in p.stdout.splitlines() if ln.strip()][-1]
    tail = p.stdout[-2000:]
    out = json.loads(line)
    assert set(out["queries"]) == keep
    for fact in ('"value"', '"value_min"', '"degrade_top"',
                 '"release_between_samples"', '"skipped"'):
        assert fact in tail, f"{fact} missing from the 2000-char tail"
    # bulk-before-facts in the actual emitted text, not just the source
    assert line.index('"samples"') < line.index('"value"')
    assert line.index('"queries_min"') < line.index('"value_min"')
