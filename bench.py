"""Headline benchmark: Gibbs sweep throughput at ML-10M scale, rank 32.

Workload (BASELINE.json flagship config, network-free): 10M synthetic
MovieLens-shaped ratings (69,878 users × 10,677 items, heavy-tailed
popularity), trained as a Bayesian FM with user/item RelationBlocks
(one-hot entity ids) plus a date one-hot main table, rank 32 — the
structure of the reference's examples/ml-10m-regression.py.

Baseline: the reference C++ engine sweeps the blocked ML-100k problem
at 20 it/s on the author's CPU (doc/source/relation-blocks.rst:199).
Cost scales ~linearly in rows×rank, so its projected ML-10M rank-32
throughput is 20 × (1e5/1e7) × (10/32) ≈ 0.0625 sweeps/s; the
BASELINE.json north star is ≥20× that (≈1.25 sweeps/s).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sweeps/sec", "vs_baseline": N}
"""

import json
import os
import sys
import time

# Persistent XLA compile cache: the remote-TPU tunnel makes each
# compilation expensive (hundreds of seconds for the first program
# storm); cached reruns compile in seconds.  Must be set before jax
# initializes.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/myfm_tpu_xla_cache"
)

import numpy as np
import scipy.sparse as sps

REFERENCE_PROJECTED_SWEEPS_PER_SEC = 0.0625
_TTFS = None  # time-to-first-sweep, set by _measure_headline
_TTFS_PARTS = {}  # phase breakdown (design/init/sweep-compile)


def _count_cache_entries():
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "")
    try:
        return len(os.listdir(cache_dir))
    except OSError:
        return 0


_CACHE_ENTRIES_AT_START = _count_cache_entries()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _emit(value, vs_baseline, metric_suffix="", **extra):
    print(
        json.dumps(
            {
                "metric": (
                    "Gibbs sweeps/sec, synthetic ML-10M (user/item "
                    "RelationBlocks + date one-hot)" + metric_suffix
                ),
                "value": value,
                "unit": "sweeps/sec",
                "vs_baseline": vs_baseline,
                **extra,
            }
        ),
        flush=True,
    )


def _tpu_alive(timeout_s=900):
    """Probe the axon TPU tunnel in a subprocess: jax.devices() hangs
    forever when the tunnel is down (observed 2026-08-17), which would
    otherwise hang the whole bench run."""
    import subprocess

    code = (
        "import jax, jax.numpy as jnp\n"
        "d = jax.devices()\n"
        "assert d and d[0].platform != 'cpu', d\n"
        "x = jnp.ones((128, 128))\n"
        "print('TPU_OK', float((x @ x)[0, 0]))\n"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], timeout=timeout_s,
            capture_output=True,
        )
        return r.returncode == 0 and b"TPU_OK" in r.stdout
    except Exception:
        return False


_HEADLINE = None  # (value, vs_baseline) once measured


def _arm_watchdog(seconds):
    """Last-resort guard: if anything downstream hangs on the tunnel,
    still emit a final headline line and exit.  The headline is
    printed LAST in a normal run, so the watchdog must emit the real
    measurement when the headline succeeded but a secondary bench
    hung; 0 only when nothing was measured at all."""
    import signal

    def _fire(signum, frame):
        log(f"WATCHDOG: bench exceeded {seconds}s — emitting final line")
        if _HEADLINE is not None:
            value, vs = _HEADLINE
            _emit(
                value, vs,
                note=(
                    "watchdog fired during secondary benches; the "
                    "headline measurement itself completed normally"
                ),
            )
        else:
            _emit(
                0.0, 0.0,
                note=(
                    "bench watchdog fired: TPU tunnel hung mid-run; 0 "
                    "means no measurement, not a perf regression"
                ),
            )
        os._exit(0)

    signal.signal(signal.SIGALRM, _fire)
    signal.alarm(seconds)


def build_problem(n_rows, rank, seed=0):
    from myfm_tpu import RelationBlock
    from myfm_tpu.utils.benchmark_data import SyntheticMovieLensManager

    t0 = time.time()
    man = SyntheticMovieLensManager(
        "10m", rank=8, random_seed=seed, n_rows=n_rows
    )
    df = man.load_rating_all()
    log(f"data generated in {time.time()-t0:.1f}s rows={len(df)}")

    users = df["user_id"].values - 1
    items = df["movie_id"].values - 1
    n_users = int(users.max()) + 1
    n_items = int(items.max()) + 1
    blocks = [
        RelationBlock(users, sps.identity(n_users, format="csr")),
        RelationBlock(items, sps.identity(n_items, format="csr")),
    ]
    # date one-hot main table (the ML-10M protocol keeps date features
    # in the main table)
    days = (
        (df["timestamp"] - df["timestamp"].min()).dt.days.values
    ).astype(np.int64)
    n_days = int(days.max()) + 1
    X_date = sps.csr_matrix(
        (np.ones(len(days), dtype=np.float64),
         (np.arange(len(days)), days)),
        shape=(len(days), n_days),
    )
    y = df["rating"].values.astype(np.float64)
    grouping = (
        [0] * n_days + [1] * n_users + [2] * n_items
    )
    return X_date, blocks, y, grouping


def _measure_headline(X, blocks, y, grouping, rank, n_timed,
                      fixed_ts=None):
    """Compile the fast-path plan and time the sweep; raises on any
    engine failure (the caller degrades to a fallback tiling)."""
    import jax
    import jax.numpy as jnp

    from myfm_tpu.design_categorical import try_compile_categorical
    from myfm_tpu.ops.gibbs import GibbsConfig
    from myfm_tpu.trainer import CategoricalGibbsTrainer

    t_fit0 = time.time()
    plan = try_compile_categorical(
        X, blocks, np.asarray(grouping, dtype=np.int32), None,
        np.float32, rank=rank, fixed_ts=fixed_ts,
    )
    assert plan is not None, "flagship workload must hit the fast path"
    # include the upload/derivation drain in the design phase: the
    # plan's device arrays must be materialized before the sweep
    jax.block_until_ready(jax.tree_util.tree_leaves(plan))
    _TTFS_PARTS["ttfs_design_s"] = round(time.time() - t_fit0, 1)
    log(
        f"design compiled in {time.time()-t_fit0:.1f}s "
        f"(F={plan.n_features}, tables="
        f"{[(t.n_cols, t.n_tiles, t.tile_rows, t.tile_entities) for t in plan.tables]})"
    )

    cfg = GibbsConfig(task="regression")
    trainer = CategoricalGibbsTrainer(
        plan, y, cfg, rank=rank, init_stdev=0.1, random_seed=42,
        dtype=np.float32,
    )
    # the trainer's resolved cfg carries the auto gram_fast_matmul
    # mode ("split"/"bf16") — the raw cfg would bench the HIGHEST
    # 6-pass matmul the real fit() loop never runs
    cfg = trainer.cfg
    master = jax.random.PRNGKey(42)
    t0 = time.time()
    state = trainer._initialize(jax.random.fold_in(master, 0))
    _ = float(jnp.sum(state.core.e))
    _TTFS_PARTS["ttfs_init_s"] = round(time.time() - t0, 1)
    log(f"init in {time.time()-t0:.1f}s")
    # warmup (compile)
    t0 = time.time()
    state = trainer._sweep(
        plan, state, trainer.y, trainer.y_tiles,
        jax.random.fold_in(master, 1), cfg, trainer._interpret,
    )
    _ = float(jnp.sum(state.core.e))
    _TTFS_PARTS["ttfs_sweep_compile_s"] = round(time.time() - t0, 1)
    log(f"first sweep (compile) in {time.time()-t0:.1f}s")
    # time-to-first-sweep (design compile + upload + init + sweep
    # compile; VERDICT r2 item 7 target < 60 s warm at 10M)
    global _TTFS
    _TTFS = time.time() - t_fit0

    # fetch a scalar per sweep: block_until_ready through the axon
    # tunnel returns early on in-flight buffers, and long unfetched
    # async chains degrade pathologically — the per-sweep sync matches
    # the real training loop (which harvests samples every iteration)
    t0 = time.time()
    checksum = 0.0
    for it in range(2, 2 + n_timed):
        state = trainer._sweep(
            plan, state, trainer.y, trainer.y_tiles,
            jax.random.fold_in(master, it), cfg, trainer._interpret,
        )
        checksum = float(state.core.alpha)
    dt = time.time() - t0
    sweeps_per_sec = n_timed / dt
    log(
        f"{n_timed} sweeps in {dt:.2f}s -> {sweeps_per_sec:.2f} sweeps/s; "
        f"alpha={checksum:.3f}"
    )
    return sweeps_per_sec, state


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_054
    rank = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n_timed = 20

    if not _tpu_alive():
        log("TPU tunnel unreachable (probe hung/failed) — no hardware")
        _emit(
            0.0, 0.0,
            note=(
                "axon TPU tunnel down at bench time (jax.devices() "
                "hangs); 0 means no measurement, not a perf "
                "regression — see STATUS.md"
            ),
        )
        return
    # generous ceiling: data gen + design compile + first-program
    # compile storm through the tunnel is ~10 min on a cold cache
    _arm_watchdog(7200)

    import jax

    log(f"jax devices: {jax.devices()}")
    X, blocks, y, grouping = build_problem(n_rows, rank)

    # The headline must ALWAYS produce a measurement: an engine failure
    # (BENCH_r02: compile-time scoped-VMEM OOM from a bad tiling)
    # degrades to the round-1 known-good tiling instead of rc=1.
    state = None
    headline_note = None
    try:
        sweeps_per_sec, state = _measure_headline(
            X, blocks, y, grouping, rank, n_timed
        )
    except Exception as exc:
        log(f"headline failed with chosen tiling: {exc!r}")
        log("retrying with fallback tiling (T=1024, S=8)")
        try:
            sweeps_per_sec, state = _measure_headline(
                X, blocks, y, grouping, rank, n_timed,
                fixed_ts=(1024, 8),
            )
            headline_note = (
                "chosen tiling failed on hardware; measured on the "
                "fallback (T=1024, S=8) tiling"
            )
        except Exception as exc2:
            log(f"fallback headline also failed: {exc2!r}")
            _emit(
                0.0, 0.0,
                note=f"engine failure on both tilings: {exc2!r}",
            )
            return

    # NOTE: the headline JSON line is printed at the very END of main()
    # (round-4 post-mortem: printing it mid-run let the secondary
    # benches' output scroll it out of the driver-captured tail —
    # BENCH_r04 parsed: null).  The watchdog emits it early if a
    # secondary bench hangs.
    global _HEADLINE
    _HEADLINE = (
        round(sweeps_per_sec, 3),
        round(sweeps_per_sec / REFERENCE_PROJECTED_SWEEPS_PER_SEC, 1),
    )

    # ---- secondary engine benches (stderr + BENCH_DETAIL.json) ------
    # regressions in the joint / VI / colored paths would otherwise be
    # invisible to the driver (round-1 VERDICT item 6).  Failures here
    # never clobber the headline line above.
    detail = {
        "fastpath_gibbs_10m_rank32_sweeps_per_sec": round(
            sweeps_per_sec, 3
        ),
        # naive speed-of-light: 3 table passes x 2 cross-gathers of
        # LANE-DENSE [N, 1+R] rows at the DATASHEET HBM bandwidth
        # (819 GB/s).  Kept for cross-round comparability; the
        # measured-device structural bound below is the real roofline
        # (this device streams at ~68 GB/s per DMA engine — see
        # hw_calibration and scripts/microbench_hbm.py).
        "fastpath_sol_fraction": round(
            (6 * n_rows * (rank + 1) * 4 / 8.19e11) * sweeps_per_sec, 3
        ),
        "hw_calibration": {
            "stream_bps": HW_STREAM_BPS,
            "agg_bps": HW_AGG_BPS,
            "matmul_flops": HW_MATMUL_FLOPS,
            "note": (
                "measured 2026-08-20 (scripts/microbench_hbm.py); the "
                "axon v5e-lite tunnel device delivers ~1/5-1/12 of "
                "v5e datasheet HBM/MXU rates"
            ),
        },
    }
    if _TTFS is not None:
        detail["time_to_first_sweep_s"] = round(_TTFS, 1)
        # phase breakdown: design (host plan + uploads + on-device
        # src/slot derivation), state init, first-sweep compile — the
        # design term is the controllable one (VERDICT r4 weak 3)
        detail.update(_TTFS_PARTS)
        # ADVICE r3: annotate whether the persistent XLA compile cache
        # was warm — a cold-cache TTFS measures the tunnel's compile
        # storm, not the steady user experience
        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "")
        detail["ttfs_compile_cache"] = (
            "warm"
            if _CACHE_ENTRIES_AT_START > 0
            else "cold"
        ) + f" ({_CACHE_ENTRIES_AT_START} entries at start)"
    try:
        bound = _fastpath_struct_bound(X, blocks, grouping, rank)
        detail["fastpath_struct_bound_sweeps_per_sec"] = round(bound, 3)
        _put_fraction(
            detail, "fastpath_struct_fraction", sweeps_per_sec / bound
        )
        bound2 = _fastpath_struct_bound(
            X, blocks, grouping, rank, two_term=True
        )
        detail["fastpath_2term_bound_sweeps_per_sec"] = round(bound2, 3)
        _put_fraction(
            detail, "fastpath_2term_fraction", sweeps_per_sec / bound2
        )
    except Exception as exc:  # pragma: no cover
        log(f"struct bound failed: {exc!r}")
    try:
        it_s, sol = _bench_joint_100k()
        detail["joint_100k_timesvdpp_rank10"] = it_s
        if sol is not None:
            _put_fraction(detail, "joint_sol_fraction", sol)
    except Exception as exc:  # pragma: no cover
        log(f"joint bench failed: {exc!r}")
    try:
        # like-for-like vs the reference's 20-22 it/s: steady it/s
        # THROUGH MyFMRegressor.fit() with the default tqdm callback
        # (relation-blocks.rst:199; round-4 VERDICT item 1)
        detail["fit_100k_timesvdpp_rank10_through_fit"] = (
            _bench_fit_100k()
        )
    except Exception as exc:  # pragma: no cover
        log(f"through-fit bench failed: {exc!r}")
    try:
        rows_s, sol = _bench_predict(X, blocks, rank, state)
        detail["predict_10m_rank32_rows_per_sec"] = rows_s
        if sol is not None:
            _put_fraction(detail, "predict_roofline_fraction", sol)
    except Exception as exc:  # pragma: no cover
        log(f"predict bench failed: {exc!r}")
    try:
        vi_sps = _bench_vi(X, blocks, y, grouping, rank)
        detail["vi_fastpath_10m_rank32"] = vi_sps
        bound_vi = _vi_struct_bound(X, blocks, grouping, rank)
        detail["vi_struct_bound_sweeps_per_sec"] = round(bound_vi, 3)
        _put_fraction(
            detail, "vi_struct_fraction", vi_sps / bound_vi
        )
    except Exception as exc:  # pragma: no cover
        log(f"VI bench failed: {exc!r}")
    try:
        detail["colored_100k_timesvdpp_rank10"] = _bench_colored_100k()
    except Exception as exc:  # pragma: no cover
        log(f"colored bench failed: {exc!r}")
    try:
        # the reference's second measured throughput: ordered probit
        # on the extended features at 12.28 it/s
        # (examples/ml-100k-extended.ipynb)
        detail["oprobit_100k_timesvdpp_rank10"] = _bench_oprobit_100k()
    except Exception as exc:  # pragma: no cover
        log(f"oprobit bench failed: {exc!r}")
    try:
        # VI on the same multi-hot design (entity+attribute fast path).
        # Round-3's "vi_100k_timesvdpp_rank10" was the raw engine
        # steady rate; round-4 silently rerouted the same key through
        # fit() (VERDICT r4 weak 5) — both are now reported under
        # explicit names so trends stay comparable.
        through, steady = _bench_vi_100k()
        detail["vi_100k_timesvdpp_rank10_through_fit"] = through
        detail["vi_100k_timesvdpp_rank10_steady"] = steady
    except Exception as exc:  # pragma: no cover
        log(f"VI 100k bench failed: {exc!r}")
    try:
        # the reference's true flagship config (ml-10m-regression.py
        # defaults to rank 128, examples/ml-10m-regression.py:20-274)
        sps128, bound128 = _bench_rank128(X, blocks, y, grouping)
        detail["fastpath_10m_rank128_sweeps_per_sec"] = sps128
        if bound128 is not None:
            detail["fastpath_10m_rank128_2term_bound"] = bound128
            if sps128 is not None:
                _put_fraction(
                    detail, "fastpath_10m_rank128_2term_fraction",
                    sps128 / bound128,
                )
    except Exception as exc:  # pragma: no cover
        log(f"rank-128 bench failed: {exc!r}")
    with open("BENCH_DETAIL.json", "w") as f:
        json.dump(detail, f, indent=1)
    log(f"detail: {json.dumps(detail)}")

    # ---- the headline line: LAST on stdout so the driver-captured
    # tail always contains it ----------------------------------------
    extra = {"note": headline_note} if headline_note else {}
    print(
        json.dumps(
            {
                "metric": (
                    f"Gibbs sweeps/sec, synthetic ML-10M "
                    f"({n_rows} rows, rank {rank}, user/item "
                    f"RelationBlocks + date one-hot)"
                ),
                "value": round(sweeps_per_sec, 3),
                "unit": "sweeps/sec",
                "vs_baseline": round(
                    sweeps_per_sec / REFERENCE_PROJECTED_SWEEPS_PER_SEC, 1
                ),
                **extra,
            }
        ),
        flush=True,
    )


def _put_fraction(detail: dict, key: str, value: float) -> None:
    """Sanity-gated fraction emit: a 'fraction of speed-of-light' > 1
    means the bound model is broken (round-4 committed a 2.952), so
    anything past a float-noise tolerance is reported as a raw value
    plus an explicit model-violation note instead."""
    value = round(value, 3)
    if value <= 1.05:
        detail[key] = value
    else:
        detail[key + "_raw"] = value
        detail[key + "_note"] = (
            "measured exceeds the modeled bound -> bound model invalid "
            "for this run; fraction withheld"
        )


# ---- measured device calibration (2026-08-20) -----------------------
# scripts/microbench_hbm.py + microbench_kernel_ts.py +
# microbench_kernel_sections.py on THIS device (the axon "TPU v5 lite"
# tunnel).  The v5e datasheet constants the round-3 bound used
# (819 GB/s HBM, 394 TF bf16) are 6-40x above what this device
# delivers; the structural bound below therefore uses the MEASURED
# numbers:
#   per-DMA-stream bandwidth  ~57-68 GB/s (1-stream sum 68, gather
#     write 57; 2-stream scale 111, 3-stream add 151 -> streams scale
#     with engines up to at least 3)
#   4096^3 matmul             ~42 TFLOP/s at default (bf16-pass)
#     precision once chained x10 inside one jit (a single dispatch
#     measures ~5 TF: ~20 ms of tunnel round-trip); the MXU is still
#     never the Gram kernel's bottleneck (split == bf16 kernel wall at
#     every tiling)
#   Gram kernel cost curve    ns/row ~= VPU_BASE + 0.55*S + 2700/T per
#     table pass, FLAT in operand bytes (DMA-only variant ~80% of the
#     full kernel; removing 512 B/row of aux or halving the gathers to
#     bf16 moved <1.5 ns/row) -> the kernel is VPU-instruction-bound.
HW_STREAM_BPS = 6.8e10  # single-stream read bandwidth, measured
HW_AGG_BPS = 1.51e11  # 3-stream aggregate, measured
# VMEM bandwidth is NOT directly measured on this device; v5e-class
# chips run multiple TB/s and this slice delivers ~1/5 of peak MXU,
# so 1.5 TB/s is the working estimate — ratios against it are model
# fractions, not hard bounds.
HW_VMEM_BPS = 1.5e12
HW_MATMUL_FLOPS = 4.2e13  # bf16-pass rate, chained measurement
# Fused Gram kernel wall floor (pure DEVICE time: carry-chained
# repetitions, tunnel RTT subtracted by comparing two chain lengths),
# measured 2026-08-20 with scripts/microbench_kernel_ts.py on
# synthetic tiles (2 cross-gather operands, split matmul, production
# tiles_per_step), at each production tiling of the 10M plans:
#   rank -> {(T, S): ns per tile row}
HW_KERNEL_FLOOR_NS = {
    # floors take the MIN over measured matmul modes and G batchings
    # (a bound must be optimistic); the production resolver's mode is
    # within ~5 % of the min everywhere
    32: {(1024, 1): 6.7, (512, 2): 8.0, (256, 4): 10.1},
    128: {(1024, 1): 12.2, (128, 2): 22.9, (256, 1): 14.8},
    # VI width (3R+2 = 98 z-columns at R = 32) plan tilings
    96: {(1024, 1): 7.0, (256, 2): 11.7, (512, 1): 8.7},
}


def _gram_kernel_floor_ns(T: int, S: int, rank: int) -> float:
    """Measured device-time floor of the fused Gram kernel itself
    (ns per tile row) at tiling (T, S): direct lookup of the
    scripts/microbench_kernel_ts.py measurement at this device's
    production tilings, falling back to the fitted rank-32 curve
    (BASE + slope*S + C/T; the production tilings all sit on S*T =
    1024 so the S/T split of the fit is conventional — the lookup
    values are the load-bearing ones)."""
    table = HW_KERNEL_FLOOR_NS.get(rank, {})
    if (T, S) in table:
        return table[(T, S)]
    return 5.1 + 0.67 * S + 1024.0 / T


def _fastpath_struct_bound(X, blocks, grouping, rank, two_term=False):
    """Structural roofline of the fast-path sweep at the MEASURED
    device calibration (constants above).

    One-term (``two_term=False``, the round-4 bound, kept for trend
    comparability): per table pass the unavoidable data motion is the
    cross-table gather of each tile row's [w | V | qs] lane-padded row
    (512 B at f32 rank 32) — NT x 512/68e9 ~= 7.5 ns/row, everything
    else assumed free.

    Two-term (``two_term=True``, round-5): the sweep's per-pass
    structure is an XLA gather op feeding the Pallas Gram kernel; per
    table the floor is

        NT x max(gather DMA ns/row, measured kernel wall ns/row)

    — max, not sum: the device demonstrably overlaps the gather's DMA
    with the kernel (sum of separately measured parts, 521 ms at 10M
    rank 32, EXCEEDS the measured whole sweep, 410 ms).  The kernel
    term is the measured device-time wall of the kernel alone at the
    table's own (T, S) tiling (_gram_kernel_floor_ns, carry-chained
    RTT-free measurement).  This prices the ~42 % of wall the round-4
    gather-only bound left formally unexplained (VERDICT r4 weak 2)."""
    from myfm_tpu.design_categorical import try_compile_categorical

    plan = try_compile_categorical(
        X, blocks, np.asarray(grouping, dtype=np.int32), None,
        np.float32, rank=rank,
    )
    return _struct_bound_from_plan(plan, rank, two_term)


def _struct_bound_from_plan(plan, rank, two_term=False):
    lane_bytes = -(-(rank + 2) // 128) * 128 * 4
    total_s = 0.0
    for t in plan.tables:
        rows_padded = t.n_tiles * t.tile_rows
        per_row_ns = lane_bytes / HW_STREAM_BPS * 1e9
        if two_term:
            per_row_ns = max(
                per_row_ns,
                _gram_kernel_floor_ns(
                    t.tile_rows, t.tile_entities, rank
                ),
            )
        total_s += rows_padded * per_row_ns * 1e-9
    return 1.0 / total_s


def _vi_struct_bound(X, blocks, grouping, rank):
    """VI analogue of the fast-path bound: the CAVI sweep's Gram rides
    the same cross-absorbing kernel but with D = 3R+2 z-columns
    ([w | wvar | V | sigma | sV] + [1 | e | q] rectangle,
    ops/categorical_vi.py), so the gathered lane row is
    ceil((3R+2)/128)*128 lanes wide and the kernel floor is evaluated
    at the VI plan's own (T, S) tiling for that width."""
    from myfm_tpu.design_categorical import try_compile_categorical

    plan = try_compile_categorical(
        X, blocks, np.asarray(grouping, dtype=np.int32), None,
        np.float32, rank=3 * rank,
    )
    return _struct_bound_from_plan(plan, 3 * rank, two_term=True)


def _timesvdpp_100k():
    sys.path.insert(0, "examples")
    from ml_features import build_feature_blocks, load_movielens

    df_train, df_test = load_movielens("100k", 0, synthetic=True)
    X_date, _, blocks, _, grouping = build_feature_blocks(
        df_train, df_test, "timesvdpp_flipped"
    )
    y = df_train.rating.values.astype(np.float64)
    return X_date, blocks, y, grouping


def _run_sweeps(trainer, plan, y_arg, cfg, n_timed, keys):
    import jax

    state = trainer._initialize(keys[0])
    state = trainer._sweep(plan, state, y_arg, keys[1], cfg)
    float(state.w0)
    t0 = time.time()
    for k in keys[2 : 2 + n_timed]:
        state = trainer._sweep(plan, state, y_arg, k, cfg)
    float(state.w0)
    return n_timed / (time.time() - t0)


def _bench_joint_100k(n_timed=20):
    """Joint-row merged sweep on ML-100k timeSVD++-flipped rank 10 —
    the reference's only measured headline (20-22 it/s on its CPU)."""
    import jax

    from myfm_tpu.design import compile_design
    from myfm_tpu.ops.gibbs import GibbsConfig
    from myfm_tpu.trainer import GibbsTrainer

    X_date, blocks, y, grouping = _timesvdpp_100k()
    plan = compile_design(
        X_date, blocks, grouping=np.asarray(grouping),
        dtype=np.float32, for_training=True, joint_dense=True,
    )
    cfg = GibbsConfig(task="regression", joint_rows=True)
    tr = GibbsTrainer(plan, y, cfg, 10, 0.1, 42, np.float32)
    master = jax.random.PRNGKey(42)
    keys = [jax.random.fold_in(master, i) for i in range(n_timed + 2)]
    # tr.cfg, NOT cfg: the trainer resolves joint_pallas_tail=None
    # (auto) to the validated kernel on TPU — the raw cfg would
    # silently bench the lax.scan tail
    it_s = _run_sweeps(tr, plan, tr.y, tr.cfg, n_timed, keys)

    # speed-of-light for the sequential color chain, refit round-4 to
    # the MEASURED device calibration (HW_MATMUL_FLOPS / HW_AGG_BPS —
    # the round-3 model used v5e datasheet numbers 6-40x above what
    # this device delivers): per tail color one [D², B]·[B, 4Pf] MXU
    # dot at HIGHEST (6-pass bf16) plus ~12 memory passes over the
    # [D², B] Gram for the T Ĝ Tᵀ update; head colors and the O(N)
    # Gram build are negligible at this scale
    D = 10 + 2
    sol_s = 0.0
    for b in plan.blocks:
        if b.dense_stack is None:
            continue
        C, B = b.dense_stack.xw.shape
        Pf = b.dense_stack.feat.shape[-1]
        mxu = 6 * (D * D) * B * (4 * Pf) * 2 / HW_MATMUL_FLOPS
        vmem = 12 * (D * D) * B * 4 / HW_VMEM_BPS
        sol_s += C * (mxu + vmem)
    sol_frac = round(it_s * sol_s, 3) if sol_s else None
    log(f"joint ML-100k timesvdpp rank 10: {it_s:.2f} it/s "
        f"(pallas_tail={tr.cfg.joint_pallas_tail}, "
        f"sol_fraction={sol_frac}; "
        f"reference C++ on real data: 20-22 it/s)")
    return round(it_s, 2), sol_frac


def _bench_rank128(X, blocks, y, grouping, n_timed=5, rank=128):
    """The reference's flagship ml-10m config is rank 128 (512 iters);
    time the fast path there (round 1: 0.63 sweeps/s, ~40x the
    rows x rank-projected reference)."""
    import jax
    import jax.numpy as jnp

    from myfm_tpu.design_categorical import try_compile_categorical
    from myfm_tpu.ops.gibbs import GibbsConfig
    from myfm_tpu.trainer import CategoricalGibbsTrainer

    t0 = time.time()
    plan = try_compile_categorical(
        X, blocks, np.asarray(grouping, dtype=np.int32), None,
        np.float32, rank=rank,
    )
    if plan is None:  # tiny-scale cardinality profiles miss the gate
        log("rank-128 bench: fast-path compile declined")
        return None, None
    bound = round(_struct_bound_from_plan(plan, rank, two_term=True), 3)
    log(f"rank-128 design compiled in {time.time()-t0:.1f}s "
        f"(2-term bound {bound} sweeps/s)")
    cfg = GibbsConfig(task="regression")
    trainer = CategoricalGibbsTrainer(
        plan, y, cfg, rank=rank, init_stdev=0.1, random_seed=42,
        dtype=np.float32,
    )
    cfg = trainer.cfg  # resolved gram_fast_matmul ("bf16" at rank 128)
    master = jax.random.PRNGKey(42)
    state = trainer._initialize(jax.random.fold_in(master, 0))
    state = trainer._sweep(
        plan, state, trainer.y, trainer.y_tiles,
        jax.random.fold_in(master, 1), cfg, trainer._interpret,
    )
    _ = float(jnp.sum(state.core.e))
    t0 = time.time()
    for it in range(2, 2 + n_timed):
        state = trainer._sweep(
            plan, state, trainer.y, trainer.y_tiles,
            jax.random.fold_in(master, it), cfg, trainer._interpret,
        )
        _ = float(state.core.alpha)
    sps_128 = n_timed / (time.time() - t0)
    log(f"fast path 10M rank 128: {sps_128:.3f} sweeps/s")
    return round(sps_128, 3), bound


def _bench_predict(X, blocks, rank, state, n_samples=8):
    """Posterior-averaged serving throughput on the flagship rows
    through the REAL ``Predictor.predict`` path (the reference
    predict_parallel analogue, predictor.hpp:35-76): n_samples kept
    FMs (w0 perturbed per sample so nothing can be elided), entity-
    space sample-stacked scoring (ops/forward_categorical).  The first
    call pays plan compile + upload (logged separately); the steady
    call is the serving number.  Returns (rows/s, roofline fraction)."""
    from myfm_tpu.containers import FM
    from myfm_tpu.ops.forward_categorical import (
        serving_roofline_rows_per_sec,
    )
    from myfm_tpu.predictor import Predictor

    core = getattr(state, "core", state)
    w0 = float(core.w0)
    w = np.asarray(core.w)
    V = np.asarray(core.V)
    n = len(np.asarray(blocks[0].original_to_block))

    pred = Predictor(rank, w.shape[0], "regression", np.float32)
    for k in range(n_samples):
        pred.samples.append(FM(w0 + 1e-6 * (k + 1), w, V, []))

    t0 = time.time()
    out = pred.predict(X, blocks)
    log(f"predict first call (plan compile + upload): "
        f"{time.time()-t0:.1f}s")
    fast_plan = pred._fast_plan_cache[1]
    t0 = time.time()
    out = pred.predict(X, blocks)
    dt = time.time() - t0
    _ = float(out[0])
    rows_per_sec = n_samples * n / dt
    sol = None
    if fast_plan is not None:
        bound = serving_roofline_rows_per_sec(
            fast_plan, n_samples, rank
        )
        sol = round(rows_per_sec / bound, 3)
    log(
        f"predict: {n_samples} samples x {n} rows in {dt:.2f}s -> "
        f"{rows_per_sec/1e6:.1f}M rows/s "
        f"(fastpath={'yes' if fast_plan is not None else 'NO'}, "
        f"roofline_fraction={sol})"
    )
    return round(rows_per_sec, 1), sol


def _bench_oprobit_100k(n_timed=10):
    """Ordered probit on the ML-100k timesvdpp features (joint sweep +
    cutpoint MH) — reference notebook: 12.28 it/s on the author's CPU
    (examples/ml-100k-extended.ipynb)."""
    import jax

    from myfm_tpu.design import compile_design
    from myfm_tpu.ops.gibbs import GibbsConfig
    from myfm_tpu.trainer import GibbsTrainer

    X_date, blocks, y, grouping = _timesvdpp_100k()
    y_int = (y - 1.0).astype(np.int64)  # ratings 1..5 -> classes 0..4
    plan = compile_design(
        X_date, blocks, grouping=np.asarray(grouping),
        dtype=np.float32, for_training=True, joint_dense=True,
    )
    cfg = GibbsConfig(task="ordered", joint_rows=True, n_class=5)
    tr = GibbsTrainer(plan, y_int, cfg, 10, 0.1, 42, np.float32)
    master = jax.random.PRNGKey(42)
    keys = [jax.random.fold_in(master, i) for i in range(n_timed + 2)]
    it_s = _run_sweeps(tr, plan, tr.y_int, tr.cfg, n_timed, keys)
    log(f"oprobit ML-100k timesvdpp rank 10: {it_s:.2f} it/s "
        f"(pallas_tail={tr.cfg.joint_pallas_tail}; reference notebook "
        "12.28 it/s)")
    return round(it_s, 2)


def _bench_colored_100k(n_timed=3):
    """Chromatic fallback path on the same multi-hot design."""
    import jax

    from myfm_tpu.design import compile_design
    from myfm_tpu.ops.gibbs import GibbsConfig
    from myfm_tpu.trainer import GibbsTrainer

    X_date, blocks, y, grouping = _timesvdpp_100k()
    plan = compile_design(
        X_date, blocks, grouping=np.asarray(grouping),
        dtype=np.float32, for_training=True,
    )
    cfg = GibbsConfig(task="regression")
    tr = GibbsTrainer(plan, y, cfg, 10, 0.1, 42, np.float32)
    master = jax.random.PRNGKey(42)
    keys = [jax.random.fold_in(master, i) for i in range(n_timed + 2)]
    it_s = _run_sweeps(tr, plan, tr.y, tr.cfg, n_timed, keys)
    log(f"colored ML-100k timesvdpp rank 10: {it_s:.2f} it/s")
    return round(it_s, 2)


def _bench_fit_100k(rank=10, n_timed=100):
    """End-to-end ``MyFMRegressor.fit`` steady it/s on the ML-100k
    timesvdpp features with the default (tqdm) callback — the
    like-for-like measure against the reference's 20-22 it/s
    (relation-blocks.rst:199, notebook 22.13 it/s measured on
    300-512-iteration runs): two warm fits whose iteration counts
    differ by n_timed; steady it/s = n_timed / delta wall (plan build
    — cached across fits — and compile cancel out).  Both chain
    lengths sit in the >= 200-iteration regime where "auto" resolves
    to the joint engine at this scale."""
    from myfm_tpu import MyFMRegressor

    X_date, blocks, y, grouping = _timesvdpp_100k()

    def fit(n_iter):
        fm = MyFMRegressor(rank=rank, random_seed=42)
        t0 = time.time()
        fm.fit(
            X_date, y, X_rel=blocks, n_iter=n_iter, grouping=grouping,
        )
        return time.time() - t0, fm

    fit(210)  # compile + populate the plan cache
    t_short, _ = fit(210)
    t_long, fm = fit(210 + n_timed)
    it_s = n_timed / max(t_long - t_short, 1e-3)
    log(f"through-fit ML-100k timesvdpp rank {rank}: {it_s:.2f} it/s "
        f"(engine={fm.history_.engine}, warm fits {t_short:.1f}s / "
        f"{t_long:.1f}s; reference C++ end-to-end: 20-22 it/s)")
    return round(it_s, 2)


def _bench_vi_100k(rank=10, n_timed=10):
    """Entity+attribute VI on the ML-100k timesvdpp features — the
    multi-hot design class that round 2 still served from the staged
    colored path (~100x slower).  Reference VI handles its relational
    configs in seconds (variational.hpp:450-833).

    Returns (through_fit_it_s, steady_it_s): the first through the
    REAL ``VariationalFMRegressor.fit`` dispatch (VERDICT r3 item 8 —
    two fits whose iteration counts differ by n_timed), the second the
    raw engine loop (sweep dispatches only), preserving the round-3
    trend metric (VERDICT r4 weak 5)."""
    from myfm_tpu import VariationalFMRegressor

    X_date, blocks, y, grouping = _timesvdpp_100k()

    def fit(n_iter):
        vfm = VariationalFMRegressor(
            rank=rank, random_seed=42, dtype=np.float32
        )
        t0 = time.time()
        vfm.fit(
            X_date, y, X_rel=blocks, n_iter=n_iter, grouping=grouping,
        )
        assert vfm.history_.engine == "fastpath", vfm.history_.engine
        return time.time() - t0, vfm

    fit(2)  # compile (cold plan/jit caches)
    t_short, _ = fit(2)  # warm baseline: plan build + 2 iters
    t_long, _ = fit(2 + n_timed)  # warm: plan build + (2 + n) iters
    it_s = n_timed / max(t_long - t_short, 1e-3)

    # raw engine steady rate on the same plan (round-3 metric)
    from myfm_tpu.design_categorical import try_compile_categorical
    from myfm_tpu.ops.variational import VariationalConfig
    from myfm_tpu.vi_trainer import CategoricalVITrainer

    plan = try_compile_categorical(
        X_date, blocks, np.asarray(grouping, dtype=np.int32), None,
        np.float32, rank=max(4 * rank, 1), allow_side=True,
    )
    steady = None
    if plan is not None:
        tr = CategoricalVITrainer(
            plan, y, VariationalConfig(task="regression"), rank, 0.1,
            42, np.float32,
        )
        state = tr._initialize()
        state = tr._sweep(
            tr.plan, state, tr.y, tr.y_tiles, tr.cfg, tr._interpret
        )
        float(state.core.elbo)
        t0 = time.time()
        for _ in range(n_timed):
            state = tr._sweep(
                tr.plan, state, tr.y, tr.y_tiles, tr.cfg, tr._interpret
            )
        float(state.core.elbo)
        steady = round(n_timed / (time.time() - t0), 2)

    log(f"VI EA fast path ML-100k timesvdpp rank {rank}: "
        f"{it_s:.2f} it/s through fit(), {steady} it/s raw engine "
        f"(warm fits {t_short:.1f}s / {t_long:.1f}s)")
    return round(it_s, 2), steady


def _bench_vi(X, blocks, y, grouping, rank, n_timed=5):
    """Entity-space VI at the flagship scale (reuses the headline
    problem; the VI tiling itself recompiles for the 3R Gram rank)."""
    from myfm_tpu.design_categorical import try_compile_categorical
    from myfm_tpu.ops.variational import VariationalConfig
    from myfm_tpu.vi_trainer import CategoricalVITrainer

    plan = try_compile_categorical(
        X, blocks, np.asarray(grouping, dtype=np.int32), None,
        np.float32, rank=3 * rank,
    )
    cfg = VariationalConfig(task="regression")
    tr = CategoricalVITrainer(plan, y, cfg, rank, 0.1, 42, np.float32)
    state = tr._initialize()
    state = tr._sweep(
        tr.plan, state, tr.y, tr.y_tiles, tr.cfg, tr._interpret
    )
    float(state.core.elbo)
    t0 = time.time()
    for _ in range(n_timed):
        state = tr._sweep(
            tr.plan, state, tr.y, tr.y_tiles, tr.cfg, tr._interpret
        )
        float(state.core.elbo)
    it_s = n_timed / (time.time() - t0)
    log(f"VI fast path 10M rank {rank}: {1/it_s:.2f} s/sweep "
        f"({it_s:.3f} sweeps/s; round-1 colored: 120 s/sweep)")
    return round(it_s, 3)


if __name__ == "__main__":
    main()
