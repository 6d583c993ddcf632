"""Performance harness (SURVEY.md §6): the BASELINE.json metrics.

Primary metric: reassigned-spectrogram frames/sec/chip at 8192-pt FFT.
Also measured: every BASELINE.json config (0-4), p50/p99 per-hop
audio-to-raster latency on the streaming path, and the 16-channel 96 kHz
32768-pt stress configuration.

The reference publishes no numbers (distribution-only repo —
BASELINE.md); ``vs_baseline`` therefore reports against the north-star
target of 60 display columns/sec sustained [NS: "sustain 60 fps"].
"""

from __future__ import annotations

import time

import numpy as np

TARGET_FPS = 60.0


def _signal(seconds: float, sample_rate: int, channels: int = 1) -> np.ndarray:
    t = np.arange(int(seconds * sample_rate), dtype=np.float64) / sample_rate
    x = 0.4 * np.sin(2 * np.pi * (100.0 * t + 0.5 * 2000.0 * t * t))
    x += 0.2 * np.sin(2 * np.pi * 440.0 * t)
    rng = np.random.default_rng(0)
    x += 0.01 * rng.standard_normal(len(t))
    if channels == 1:
        return x.astype(np.float32)
    return np.stack([np.roll(x, 31 * c) for c in range(channels)]).astype(np.float32)


def _throughput(settings, seconds: float, iters: int) -> dict:
    """Batch-path columns/sec: steady-state timing of the fused jit step."""
    import jax
    from emspec.pipeline import Pipeline
    from emspec.post.chain import PostState

    pipe = Pipeline(settings)
    x = _signal(seconds, settings.sample_rate, settings.channels)
    if settings.channels == 1 and x.ndim > 1:
        x = x[0]
    xd = jax.device_put(x)
    t_count = pipe.num_columns(x.shape[-1])
    p = pipe.params()
    lead = (settings.channels,) if settings.channels > 1 else ()
    st = PostState.init(lead + (pipe.rows,))

    vis, rgba, st1 = pipe._batch_jit(xd, p, st, t_count)   # compile
    _ = np.asarray(st1.agc_ref)                            # force execution
    # Honest timing on a deferred-execution runtime (see BENCH.md):
    # 1) chain the PostState through every call so each iteration depends
    #    on the previous one (no dedup/reorder possible);
    # 2) end with a HOST FETCH of a chained scalar — block_until_ready is
    #    not a reliable execution barrier on remote backends, a host copy
    #    is (it forces the whole dependency chain);
    # 3) report the MARGINAL per-call cost from two chain lengths, so the
    #    fixed per-chain round-trip doesn't inflate the number;
    # 4) size the chains so the measured work dwarfs the relay's ~10s-of-ms
    #    jitter, and take the MEDIAN of repeated marginals (sub-ms calls on
    #    short chains were measured anywhere between 0.4 and 2.2 ms/call —
    #    chain-length auto-scaling is what makes the number reproducible).
    def chain(it, st_c):
        t0 = time.perf_counter()
        for _ in range(it):
            _, _, st_c = pipe._batch_jit(xd, p, st_c, t_count)
        _ = np.asarray(st_c.agc_ref)
        return time.perf_counter() - t0

    est = chain(max(iters, 2), st) / max(iters, 2)         # rough s/call
    # sub-ms calls need LONG chains: the relay's drift over a ~1 s window
    # is tens of ms, so the (hi − lo) delta must dwarf it — 1.5 s of work
    # per chain and 7 interleaved lo/hi pairs measured the primary config
    # at 233/182/240k in three consecutive runs (~±15%) where 0.8 s/5
    # reps had swung ±40% run-to-run
    target_s = 0.3 if iters <= 3 else 1.5                  # per-chain work
    hi = int(np.clip(np.ceil(target_s / max(est, 1e-5)), max(iters, 4), 1024))
    lo = max(hi // 4, 2)
    reps = 3 if iters <= 3 else 7
    # a non-positive sample means the relay's jitter exceeded the chains'
    # work delta (observed in --quick mode: a NEGATIVE frames/s would
    # have been recorded) — double the chains and redo the whole rep set
    # rather than cherry-picking the positive samples
    for _attempt in range(4):
        samples = []
        for _ in range(reps):
            t_lo = chain(lo, st)
            t_hi = chain(hi, st)
            samples.append((t_hi - t_lo) / (hi - lo))
        if min(samples) > 0:
            break
        hi = min(hi * 2, 4096)
        lo = max(hi // 4, 2)
    dt = float(np.median(samples))                         # marginal s/call
    if dt <= 0:
        # all retries jitter-swamped: fall back to whole-chain time per
        # call — overhead-inclusive, so a conservative UNDERestimate of
        # throughput, but positive and honest (never emit ≤ 0)
        dt = t_hi / hi
    cols_per_sec = t_count / dt
    # size the device scan so each chain call does ≥10 ms of device work:
    # k=8 was fine at 4 ms/call but post-optimization sub-ms calls left
    # only ~3 ms of signal — inside the relay's jitter (one run measured
    # a physically impossible negative marginal)
    k_dev = int(np.clip(np.ceil(0.010 / max(dt, 1e-5)), 8, 512))
    dev_ms = _device_scan_ms_per_call(pipe, xd, p, st, t_count, k=k_dev)
    from emspec.bench.roofline import roofline_report
    return {
        "columns_per_sec": cols_per_sec,
        "frames_per_sec_total": cols_per_sec * max(settings.channels, 1),
        "t_count": t_count,
        "iters": iters,
        "ms_per_call_marginal": dt * 1e3,
        # chip capability with the relay's per-call dispatch floor
        # excluded (same scan technique as device_scan_ms_per_hop):
        "device_ms_per_call": dev_ms,
        "device_columns_per_sec": t_count / (dev_ms / 1e3),
        "realtime_factor": cols_per_sec * pipe.hop / settings.sample_rate,
        # estimated FLOPs/bytes → achieved rates vs v5e peaks (§5.5 /
        # VERDICT #8: arithmetic-intensity regressions become visible)
        "roofline": roofline_report(pipe, cols_per_sec),
    }


def _device_scan_ms_per_call(pipe, xd, p, st0, t_count,
                             k: int = 8, reps: int = 5) -> float:
    """Per-call DEVICE cost of the batch pipeline: scan k full calls
    inside ONE jit so the relay's per-call dispatch floor (measured
    2.5–4.4+ ms and time-varying — BENCH.md methodology note 4) drops
    out.  Each iteration multiplies the input by a loop-carried
    zero-valued probe, so XLA cannot hoist the (loop-invariant)
    analysis out of the scan; PostState chains as in production.
    Marginal, fetch-forced, median of reps (emspec.bench.measure)."""
    import jax
    import jax.numpy as jnp
    from emspec.bench.measure import chain_marginal_ms

    def step(carry, _):
        st, probe = carry
        xi = xd * (1.0 + 0.0 * probe)
        vis, rgba, st = pipe._batch_vis(xi, p, st, t_count)
        # chain vis AND rgba: the LUT feeds nothing else and would be
        # dead code otherwise
        pr = (jnp.ravel(vis)[0] * 0.0
              + jnp.ravel(rgba)[0].astype(jnp.float32) * 0.0)
        return (st, pr), None

    f = jax.jit(lambda c: jax.lax.scan(step, c, None, length=k)[0])
    return chain_marginal_ms(
        f, lambda: (st0, jnp.float32(0.0)), k, reps=reps)


def _latency(settings, hops: int = 200) -> dict:
    """Streaming-path per-hop audio-to-raster latency (hop block staged
    → rolling fused step → block on the emitted RGBA column), driven
    through the Stream's OWN staging machinery (`_stage_one`, which
    primes the device window at hop 0 exactly like production)."""
    import jax
    from emspec.stream import Stream

    from emspec.pipeline import get_pipeline
    pipe = get_pipeline(settings)
    total_hops = hops + max(hops // 2, 8) + pipe.reach + 8
    seconds = ((pipe.n_max + total_hops * pipe.hop)
               / settings.sample_rate + 0.1)
    st = Stream(settings, ring_seconds=seconds + 1.0)   # whole signal resident
    x = _signal(seconds, settings.sample_rate, settings.channels)
    st.ring.push(x)

    def one_hop(materialize_carry: bool = True):
        staged = st._stage_one()
        assert staged, "latency signal exhausted (total_hops sizing bug)"
        dropped, dev, w_init = st._staged.popleft()
        cols = st._dispatch(dev, dropped, w_init)
        if materialize_carry:
            # deferred-execution runtimes replay the whole un-materialized
            # carry chain on every fetch (quadratic blowup); forcing the
            # tiny hop counter to host each hop bounds the chain at 1
            _ = int(st._carry[1][0])
        return cols[0] if cols else None

    # warmup (compile + fill the pending ring); np.asarray forces real
    # execution — block_until_ready is not a reliable barrier on remote
    # backends (BENCH.md methodology)
    for _ in range(st.reach + 3):
        col = one_hop()
        if col is not None:
            _ = np.asarray(col.rgba)

    # (a) round-trip: stage window → step → RGBA column fetched to host.
    # Includes the environment's tunnel fetch (~30 ms here); on a locally
    # attached TPU this is the true audio-to-raster latency.
    times = []
    for _ in range(hops):
        t0 = time.perf_counter()
        col = one_hop()
        _ = np.asarray(col.rgba)   # display can only blit a host column
        times.append(time.perf_counter() - t0)
    times = np.asarray(times) * 1e3

    # (b) pipelined marginal: N hops chained (the carry serializes them),
    # one fetch at the end — per-hop device cost when display fetches
    # overlap compute, tunnel round-trip excluded.
    k = max(hops // 2, 8)
    t0 = time.perf_counter()
    for _ in range(k):
        col = one_hop(materialize_carry=False)   # one chain, one fetch
    _ = np.asarray(col.rgba)
    pipelined_ms = (time.perf_counter() - t0) / k * 1e3

    device_scan_ms = _device_scan_ms_per_hop(settings)
    # (d) the <10 ms audio-to-raster north star as a REPORTED number
    # (round-3 VERDICT #4): on a locally attached TPU the per-hop path is
    # device step + one RGBA column fetched over PCIe — compose the
    # measured device_scan marginal with a measured bulk-transfer rate
    # (size-marginal, so the relay's fixed round-trip latency cancels)
    # into a derived local-host p50, printed beside the relay p50 with
    # its full derivation.
    rgba = col.rgba if hasattr(col, "rgba") else col
    col_bytes = int(np.asarray(rgba).nbytes)
    fetch = _fetch_throughput_gbs()
    if fetch is None:
        # every size-marginal sample was non-positive (noise/fast local
        # link): report the derivation as unmeasurable rather than
        # backing the north-star number with an invented constant
        derived = {
            "device_scan_ms_per_hop": device_scan_ms,
            "column_bytes": col_bytes,
            "fetch_gbs_measured": None,
            "note": "D2H size-marginal unmeasurable this run; "
                    "local_host_p50_ms omitted",
        }
    else:
        derived = {
            "device_scan_ms_per_hop": device_scan_ms,
            "column_bytes": col_bytes,
            "fetch_gbs_measured": round(fetch, 2),
            "column_fetch_ms": round(col_bytes / (fetch * 1e9) * 1e3, 4),
        }
        derived["local_host_p50_ms"] = round(
            device_scan_ms + derived["column_fetch_ms"], 4)

    return {"p50_ms": float(np.percentile(times, 50)),
            "p99_ms": float(np.percentile(times, 99)),
            "mean_ms": float(times.mean()),
            "pipelined_ms_per_hop": pipelined_ms,
            # (c) device-only per-hop cost: the same _stream_step scanned
            # on device (no per-hop host dispatch at all) — the number a
            # locally attached TPU's audio-to-raster latency is built from
            "device_scan_ms_per_hop": device_scan_ms,
            # (d) derived audio-to-raster p50 on a locally attached chip:
            # device hop + column D2H at the measured transfer rate.  The
            # relay p50 above includes this environment's tunnel; the
            # north-star "<10 ms" claim is adjudicated against THIS number
            # and its derivation, not prose (BENCH.md latency section).
            "derived_local_host": derived,
            "hops": hops}


def _fetch_throughput_gbs(reps: int = 5) -> float | None:
    """Measured device→host bulk-transfer rate in GB/s, or None when
    unmeasurable (every size-marginal sample non-positive — callers
    must surface that rather than derive numbers from a fabricated
    rate).  Measured as the SIZE MARGINAL between a small and a large
    fetch so the fixed per-fetch round-trip (the tunnel's ~30 ms here,
    a PCIe doorbell locally) cancels — the same two-point technique as
    chain_marginal_ms.  Medians over reps; arrays are freshly computed
    on device each rep so no cache/dedup path can satisfy the fetch."""
    import jax
    import jax.numpy as jnp

    small_n, big_n = 1 << 20, 16 << 20            # 4 MB / 64 MB of f32
    add = jax.jit(lambda v, n: v + jnp.zeros((n,), jnp.float32),
                  static_argnames="n")

    def fetch_s(n: int, seed: float) -> float:
        a = add(jnp.float32(seed), n)
        # force EXECUTION through a derived scalar — fetching `a` itself
        # here would leave a cached host copy and the timed fetch free
        _ = float(a[0])
        t0 = time.perf_counter()
        _ = np.asarray(a)
        return time.perf_counter() - t0

    samples = []
    for r in range(reps):
        t_small = fetch_s(small_n, 1.0 + r)
        t_big = fetch_s(big_n, 2.0 + r)
        dt = t_big - t_small
        if dt > 0:
            samples.append(4 * (big_n - small_n) / dt / 1e9)
    # None = unmeasurable (all marginals non-positive); callers must
    # surface that rather than fabricate a rate
    return float(np.median(samples)) if samples else None


def _device_scan_ms_per_hop(settings, k: int = 512, reps: int = 5) -> float:
    """Per-hop device cost of the exact PRODUCTION streaming step —
    ``_stream_step_rolling`` (window-in-carry; the roll concat is part
    of the cost), scanned over k staged hop blocks inside ONE jit call —
    no per-hop host dispatch, so the environment's tunnel round-trips
    (~30 ms each here) drop out entirely.  Marginal, fetch-forced,
    median of ``reps`` samples (BENCH.md methodology).  k = 512: at the
    post-optimization ~21 µs hop, k = 64 left only ~1.5 ms of device
    work per chain call — inside the relay's jitter, and the full-report
    run once measured a (clamped-impossible) negative marginal.  512
    hops ≈ 12 ms per call puts the signal well above the noise; the
    staged blocks cost k·hop·4 bytes of HBM (32× less than staging
    full windows)."""
    import jax
    import jax.numpy as jnp
    from emspec.pipeline import get_pipeline

    pipe = get_pipeline(settings)
    ch = settings.channels
    lead = (ch,) if ch > 1 else ()
    n_max, hop = pipe.n_max, pipe.hop
    secs = (n_max + k * hop) / settings.sample_rate + 0.05
    x = _signal(secs, settings.sample_rate, ch)
    if ch == 1 and x.ndim > 1:
        x = x[0]
    # rolling-window staging: prime with window 0's prefix, then k
    # hop-blocks — block t completes window t (stream.py _stage_one)
    w0 = np.concatenate(
        [np.zeros(x.shape[:-1] + (hop,), np.float32),
         x[..., :n_max - hop]], axis=-1).astype(np.float32)
    blocks = np.stack([x[..., t * hop + n_max - hop: t * hop + n_max]
                       for t in range(k)])               # (k, [ch,] hop)
    bd = jax.device_put(blocks.astype(np.float32))
    p = pipe.params()

    from emspec.bench.measure import chain_marginal_ms

    def scan_fn(c2, b):
        roll, probe = c2
        roll, (vis, rgba, _) = pipe._stream_step_rolling(roll, b, p)
        # chain BOTH display outputs into the carried probe so no stage
        # (incl. the LUT, which feeds nothing else) is dead code
        probe = (probe + jnp.ravel(vis)[0] * 0.0
                 + jnp.ravel(rgba)[0].astype(jnp.float32) * 0.0)
        return (roll, probe), None

    # bd rides as a closed-over device constant; the stream carry chains
    # every hop and the probe is a jit output, so nothing is DCE-able and
    # forcing one leaf runs the whole executable
    f = jax.jit(lambda c: jax.lax.scan(scan_fn, c, bd)[0])
    return chain_marginal_ms(
        f, lambda: ((jnp.asarray(w0), pipe.init_stream_carry(lead)),
                    jnp.float32(0.0)),
        k, reps=reps)


def write_profiler_trace(settings, outdir: str, hops: int = 40) -> str:
    """Run ``hops`` streaming steps under ``jax.profiler.trace`` and save
    the artifact (xplane + trace.json.gz) to ``outdir``.

    On a locally attached TPU the artifact contains the device timeline
    per hop; through this environment's remote tunnel only host-side
    events (PJRT dispatch, transfers) are captured — the device-side
    number is then ``device_scan_ms_per_hop`` (measured, not traced)."""
    import jax
    from emspec.stream import Stream

    st = Stream(settings, ring_seconds=8.0)
    hop, n_max = st.pipe.hop, st.pipe.n_max
    secs = (n_max + (hops + st.reach + 4) * hop) / settings.sample_rate + 0.1
    x = _signal(secs, settings.sample_rate, settings.channels)
    if settings.channels == 1 and x.ndim > 1:
        x = x[0]
    pos = n_max + (st.reach + 2) * hop
    cols = st.push(x[..., :pos])                           # warmup + compile
    if cols:
        _ = np.asarray(cols[-1].rgba)
    with jax.profiler.trace(outdir):
        for _ in range(hops):
            cols = st.push(x[..., pos:pos + hop])
            pos += hop
            if cols:
                _ = np.asarray(cols[-1].rgba)              # display fetch
    return outdir


def primary_metric(quick: bool = False) -> dict:
    """The headline: reassigned frames/sec/chip at 8192-pt FFT.

    ``value`` is the median relay-marginal over three full measurements
    (quick: one) — an end-to-end number that includes this environment's
    tunnel dispatch residual, which drifts it ±20% between runs even
    with 1.5 s chains (BENCH.md variance note).  The STABLE round-over-
    round number is ``device_frames_per_sec``: chip capability from the
    device-side scan marginal (reproducible to ~2%); ``band`` is the
    [min, max] of the relay samples so a reader can tell relay weather
    from engineering (VERDICT round-2 #2)."""
    from emspec.config import Settings
    s = Settings(mode="enhanced", multires=False, fft_size=8192)
    runs = 1 if quick else 3
    if not quick:
        # discarded session warm-up: the first measurement in a fresh
        # process through this environment's tunnel reads up to ~30% low
        # with a wide internal band (measured 4×-cold-run A/B, BENCH.md
        # item 33) — one short throwaway pass absorbs it so the driver's
        # single invocation records steady-state capability
        _throughput(s, seconds=1.0, iters=2)
    # 16 s of signal = t_count≈372 frames per call: the saturating batch
    # (BENCH.md item 37 A/B — 4 s leaves the relay's ~0.3 ms per-call
    # dispatch residual at ~3× the device work, 64 s degrades the device
    # itself).  At t≈372 the relay marginal sits within ~5% of chip
    # capability, so `value` finally measures engineering, not weather.
    reports = [_throughput(s, seconds=2.0 if quick else 16.0,
                           iters=3 if quick else 10)
               for _ in range(runs)]
    vals = [r["columns_per_sec"] for r in reports]
    dev_vals = [r["device_columns_per_sec"] for r in reports]
    v = float(np.median(vals))
    return {
        "metric": "reassigned_spectrogram_frames_per_sec_8192pt",
        "value": round(v, 1),
        "unit": "frames/s/chip",
        # no published reference numbers exist (BASELINE.md); compare to the
        # 60 fps sustained-display north-star target
        "vs_baseline": round(v / TARGET_FPS, 2),
        # chip capability: per-call dispatch floor excluded via the
        # device-side scan marginal — the reproducible number
        "device_frames_per_sec": round(float(np.median(dev_vals)), 1),
        "band": [round(min(vals), 1), round(max(vals), 1)],
        "device_band": [round(min(dev_vals), 1), round(max(dev_vals), 1)],
    }


def run_benchmarks(quick: bool = False) -> dict:
    """Full report over the BASELINE.json configs."""
    import jax
    from emspec.config import Settings

    secs = 1.0 if quick else 4.0
    iters = 2 if quick else 8
    hops = 50 if quick else 200
    from emspec.dsp.pallas.validate import validate_kernels
    report: dict = {
        "device": str(jax.devices()[0]),
        # Mosaic compile + parity of both kernels on the live backend —
        # every bench run re-validates before reporting numbers
        "kernels": validate_kernels(quick=quick),
        "primary": primary_metric(quick),
        "configs": {},
    }
    cfgs = {
        "0_stft_2048_natural": (Settings(
            mode="natural", multires=False, fft_size=2048), secs),
        "1_reassigned_2048": (Settings(
            mode="enhanced", multires=False, fft_size=2048), secs),
        "2_multires_log_merge": (Settings(mode="enhanced", multires=True),
                                 secs),
        "4_stress_16ch_96k_32768": (Settings(
            mode="enhanced", multires=False, fft_size=32768,
            sample_rate=96_000, channels=16), secs),
    }
    if not quick:
        # SURVEY §5.7 scaling extensions ("32768 and beyond") — not
        # BASELINE.json configs, and they carry the two largest compiles
        # in the codebase, so the --quick smoke test (the documented
        # jax-upgrade check) skips them.  65536 = (256, 256); 131072 =
        # (256, 512) — step-3 tables 512x512, t_tile=8 still fits v5e
        # VMEM (bench_probes/fft131072_probe.py: 44.7k cols/s device,
        # 4,800x real time at 96 kHz).
        #
        # Per-config signal length = each config's MEASURED optimum, one
        # citable number each (round-3 VERDICT #8; BENCH items 36/44):
        # 65536 re-pinned at 32 s (t=184, the item-36 steady-state
        # optimum — the old 4 s pin understated it ~30%, 16 s still
        # ~13%); 131072 measured BEST at t=8, so 4 s IS its optimum;
        # 262144 needs 8 s just to hold >1.5 windows.
        cfgs["5_ext_65536_96k"] = (Settings(
            mode="enhanced", multires=False, fft_size=65536,
            sample_rate=96_000), 32.0)
        cfgs["6_ext_131072_96k"] = (Settings(
            mode="enhanced", multires=False, fft_size=131072,
            sample_rate=96_000), secs)
        cfgs["7_ext_262144_96k"] = (Settings(
            mode="enhanced", multires=False, fft_size=262144,
            sample_rate=96_000), 8.0)
    for name, (s, cfg_secs) in cfgs.items():
        report["configs"][name] = _throughput(s, cfg_secs, iters)
    # config 3 is the streaming path: measured as latency
    report["configs"]["3_streaming_latency_default"] = _latency(
        Settings(mode="enhanced", multires=True), hops)
    report["configs"]["3_streaming_latency_8192"] = _latency(
        Settings(mode="enhanced", multires=False, fft_size=8192), hops)
    return report


def sustained_display(settings=None, seconds: float = 8.0,
                      drain_hz: float = 60.0, user_dir=None) -> dict:
    """Product-level north-star measurement [NS: "sustain 60 fps"]: run
    the REAL display stack — real-time-paced synthetic capture → seqlock
    ring → streaming device step → waterfall — for ``seconds`` of wall
    clock, draining at the display cadence like the window shells do,
    and report whether column production kept up with the audio clock.

    Unlike ``_throughput``/``_latency`` (device- and call-level numbers)
    this exercises the whole L1→L4 concurrency story at once: producer
    thread pacing, ring overrun handling, per-hop dispatch, waterfall
    blitting.  ``keepup_ratio`` ≈ 1.0 means the display never starved;
    the reach-delay warmup and ±1 hop of clock quantization make ~0.95+
    the healthy band.  ``emspec bench --sustained`` prints it.
    """
    import contextlib
    import tempfile

    from emspec.config import Settings

    s = settings or Settings(mode="enhanced", multires=True)
    tmp_ctx = (tempfile.TemporaryDirectory(prefix="emspec_sustained_")
               if user_dir is None else contextlib.nullcontext(str(user_dir)))
    with tmp_ctx as ud:
        return _sustained_run(s, ud, seconds, drain_hz)


def _sustained_run(s, ud, seconds: float, drain_hz: float) -> dict:
    import time as _time

    from emspec.app import EmSpecApp
    from emspec.shell.feed import AudioFeeder

    app = EmSpecApp(s, user_dir=ud)
    # compile outside the clock: one silent window through the step
    warm = np.zeros((s.channels,
                     app.stream.pipe.n_max + app.stream.pipe.hop),
                    np.float32)
    app.push_audio(warm if s.channels > 1 else warm[0])

    feeder = AudioFeeder(app, source="synthetic")
    ch = s.channels
    empty = (np.zeros((ch, 0), np.float32) if ch > 1
             else np.zeros(0, np.float32))
    emitted = 0
    gaps = []
    feeder.start()
    t0 = _time.perf_counter()
    last = t0
    try:
        while True:
            now = _time.perf_counter()
            if now - t0 >= seconds:
                break
            got = app.push_audio(empty)
            if got:
                gaps.append(now - last)
                last = now
            emitted += got
            _time.sleep(1.0 / drain_hz)
        # clock stops HERE: feeder.stop() joins the capture thread (up to
        # a capture block) and must not count against the keep-up ratio
        elapsed = _time.perf_counter() - t0
    finally:
        feeder.stop()
        app.close()               # abandon any queued background compiles
    rate = app.settings.sample_rate
    hop = app.stream.pipe.hop
    expected = elapsed * rate / hop
    gaps_ms = sorted(g * 1e3 for g in gaps) or [0.0]
    return {
        "seconds": round(elapsed, 2),
        "expected_cols": int(expected),
        "emitted_cols": emitted,
        "keepup_ratio": round(emitted / max(expected, 1e-9), 4),
        "cols_per_sec_wall": round(emitted / elapsed, 1),
        "hop_rate_hz": round(rate / hop, 1),
        "p50_drain_gap_ms": round(gaps_ms[len(gaps_ms) // 2], 1),
        "p99_drain_gap_ms": round(gaps_ms[int(len(gaps_ms) * 0.99)
                                          if len(gaps_ms) > 1 else 0], 1),
    }
