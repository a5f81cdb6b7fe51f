"""Persistent-XLA-cache setup + pre-seeded warm cache for cold starts.

The reference's Cython build path has zero warmup cost
(reference pydiskann/cython_utils.pyx:269-369); ours pays XLA compiles
on the first build in a fresh checkout (~172 s at 200k measured
2026-08-19, vs 12 s steady-state). The persistent compilation cache is
proven to work cross-process through the axon tunnel (CLAUDE.md), so we
ship the compiled programs for the standard build/serving geometries as
a compressed archive (`prewarmed_cache.tar.zst` at the repo root,
produced by `benchmarks/collect_prewarm.py` on the target chip) and
unpack it into the cache dir the first time a process starts without
one. A checkout then builds at fresh-process-warm-cache speed (~40 s at
200k, within the >=4x-over-reference cold target) instead of
compile-everything speed.

Staleness: cache keys cover the full XLA program, so any kernel-source
or jax/libtpu change silently invalidates entries — they stop hitting,
nothing breaks. (Root-caused 2026-08-21: keys ALSO embedded the cache
dir's path string via jax 0.9's xla_gpu_per_fusion_autotune_cache_dir
injection, so archive entries collected under /tmp/prewarm_cache could
never hit from .jax_cache; `enable_compilation_cache` now sets
jax_persistent_cache_enable_xla_caches="none", making keys
dir-independent — verified: a fresh checkout's 200k build went 386 s /
0 hits -> 74 s / 11 hits on the same chip.) The `cache_hits`/`cache_misses` counters exported by
`cache_metrics()` (emitted in bench.py's `prewarm` field) are the
check that the shipped entries still match.

Regeneration POLICY (ADVICE r3 #4 / VERDICT r4 #9): the archive stays
tracked in git — it is the cold-start story a fresh checkout gets and
what the driver's `build_seconds_cold` protocol exercises — and is
regenerated on the target chip with `make prewarm` (INCLUDE_1M=1
collect_prewarm run) whenever a bench line reports
`prewarm.cache_misses` above ~10, i.e. after any round that touched
kernel/traced code. One archive generation per such round, at
round end once kernels have settled; the counters in the next driver
line verify the refresh took.
"""

from __future__ import annotations

import logging
import os
import pathlib
import tarfile

logger = logging.getLogger(__name__)

_REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent.parent
_ARCHIVE_NAMES = ("prewarmed_cache.tar.zst", "prewarmed_cache.tar.gz")

# observability for the driver bench (VERDICT r3 #4): how many entries
# the shipped archive actually contributed this process, and live
# hit/miss counters from jax's monitoring events, so a slow cold build
# is attributable (cache never seeded? entries stale? tunnel slow?)
_METRICS = {"seeded_entries": 0, "cache_hits": 0, "cache_misses": 0}
_LISTENERS_INSTALLED = False


def install_cache_metrics() -> None:
    """Count persistent-cache hits/misses via jax.monitoring (events
    `/jax/compilation_cache/cache_hits` / `cache_misses`, both plain
    record_event in jax 0.9). Idempotent; must run before the first
    compile to see everything."""
    global _LISTENERS_INSTALLED
    if _LISTENERS_INSTALLED:
        return
    from jax._src import monitoring

    def _on_event(event: str, *a, **k) -> None:
        if event.endswith("/cache_hits"):
            _METRICS["cache_hits"] += 1
        elif event.endswith("/cache_misses"):
            _METRICS["cache_misses"] += 1

    monitoring.register_event_listener(_on_event)
    _LISTENERS_INSTALLED = True


def cache_metrics() -> dict:
    out = dict(_METRICS)
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if cache_dir and pathlib.Path(cache_dir).is_dir():
        out["cache_dir_entries"] = sum(
            1 for p in pathlib.Path(cache_dir).iterdir()
            if p.is_file() and not p.name.startswith(".")
        )
    return out


def enable_compilation_cache(seed: bool = True) -> pathlib.Path:
    """Point JAX's persistent compilation cache at `<repo>/.jax_cache`
    (honoring a pre-set JAX_COMPILATION_CACHE_DIR) and, once per cache
    dir, unpack the shipped pre-warmed entries into it. Must run before
    the first jax compile; safe to call repeatedly.

    Setting the env vars is NOT enough under the axon sitecustomize:
    jax is imported (and its config flags bound from the environment)
    before any user code runs, so a post-import `os.environ[...]` is
    silently ignored — a full 893 s cold build captured ZERO cache
    entries that way (2026-08-21; CLAUDE.md). `jax.config.update` works
    after import, so this sets BOTH: the env for any child process that
    starts fresh, and the live config for this one."""
    cache_dir = pathlib.Path(
        os.environ.setdefault(
            "JAX_COMPILATION_CACHE_DIR", str(_REPO_ROOT / ".jax_cache")
        )
    )
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_ENABLE_XLA_CACHES", "none")
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            float(os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"]),
        )
        # CRITICAL for the shipped archive (root-caused 2026-08-21):
        # with the default "xla_gpu_per_fusion_autotune_cache_dir", jax
        # 0.9 writes `<cache_dir>/xla_gpu_per_fusion_autotune_cache_dir`
        # into the compile options' debug_options, and
        # _hash_serialized_compile_options does NOT strip that field —
        # so the cache-dir PATH STRING is part of every cache key.
        # Entries collected at /tmp/prewarm_cache could never hit from
        # .jax_cache (and even ".jax_cache" vs "/root/repo/.jax_cache"
        # miss each other). The feature is a GPU autotune cache — dead
        # weight on TPU — so turn it off and make keys dir-independent.
        jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    except Exception:  # pre-import call sites still get the env vars
        logger.debug("jax.config.update for the cache failed", exc_info=True)
    if seed:
        try:
            seed_cache(cache_dir)
        except Exception:  # a corrupt archive must never block serving
            logger.warning("pre-warmed cache unpack failed", exc_info=True)
    return cache_dir


def seed_cache(cache_dir: pathlib.Path) -> int:
    """Unpack the pre-warmed archive into `cache_dir` (entries that
    already exist are kept — they may be newer). Tries every archive
    name in order, so a missing decompressor for one format falls
    through to the next instead of silently disabling the feature
    (VERDICT r3 #4). Returns the number of entries written; no-op
    without an archive or after the first seed
    (`.seeded-<archive mtime>` marker)."""
    for name in _ARCHIVE_NAMES:
        archive = _REPO_ROOT / name
        if not archive.exists():
            continue
        cache_dir.mkdir(parents=True, exist_ok=True)
        marker = cache_dir / f".seeded-{int(archive.stat().st_mtime)}"
        if marker.exists():
            return 0
        if archive.suffix == ".zst":
            try:
                import zstandard
            except ImportError:  # no zstd -> try the .gz twin
                logger.warning(
                    "%s needs the zstandard module (absent); trying the "
                    "next archive format", archive.name,
                )
                continue
            with archive.open("rb") as fh:
                stream = zstandard.ZstdDecompressor().stream_reader(fh)
                n = _extract_missing(
                    tarfile.open(fileobj=stream, mode="r|"), cache_dir
                )
        else:
            n = _extract_missing(tarfile.open(archive, mode="r:gz"),
                                 cache_dir)
        marker.write_text("seeded\n")
        _METRICS["seeded_entries"] += n
        logger.info("pre-warmed XLA cache: %d entries -> %s", n, cache_dir)
        return n
    return 0


def _extract_missing(tf: tarfile.TarFile, cache_dir: pathlib.Path) -> int:
    n = 0
    with tf:
        for member in tf:
            if not member.isfile():
                continue
            name = pathlib.Path(member.name).name  # flat layout only
            dest = cache_dir / name
            if dest.exists():
                continue
            src = tf.extractfile(member)
            if src is None:
                continue
            tmp = cache_dir / (name + ".tmp")
            with tmp.open("wb") as out:
                out.write(src.read())
            tmp.replace(dest)
            n += 1
    return n
