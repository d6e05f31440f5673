"""Persistent-compilation-cache helpers.

XLA:CPU persists AOT-compiled executables keyed by program only — an entry
compiled on one host fails its machine-feature check on another
(cpu_aot_loader: "Machine type used for XLA:CPU compilation doesn't match")
and every lookup falls back to a full recompile, silently making the cache
useless when /tmp survives a host change. Keying the cache directory by a
host signature gives each machine its own working cache.
"""
import hashlib
import os
import platform


def host_signature():
    """Short stable id of this host's CPU microarchitecture.

    Includes model/stepping/microcode in addition to the flags line:
    XLA:CPU's AOT loader compares LLVM target features (e.g.
    prefer-no-scatter, a microcode-dependent downfall mitigation) that can
    differ between hosts whose /proc/cpuinfo flags lines are identical."""
    keys = ("flags", "Features", "model name", "stepping", "microcode",
            "cpu family", "model")
    try:
        lines = []
        with open("/proc/cpuinfo") as f:
            for ln in f:
                if ln.startswith(keys):
                    lines.append(ln.strip())
                if ln.strip() == "":  # first core only
                    break
        sig = "|".join(lines)
    except OSError:
        sig = platform.processor()
    raw = f"{platform.machine()}|{sig}".encode()
    return hashlib.md5(raw).hexdigest()[:10]


def host_keyed_cache_dir(base="/tmp/jax_comp_cache"):
    return f"{base}_{host_signature()}"


def enable_persistent_cache(base="/tmp/jax_comp_cache", min_compile_secs=0.0):
    """Point jax's persistent compilation cache at a host-keyed directory.
    Call after importing jax, before the first jit compile. Best-effort.

    min_compile_secs=0 persists even tiny programs: the test gate's compile
    bill is hundreds of ~30 ms programs per process (measured: one
    transformer test = 507 backend compiles, 15 s), each far below the old
    0.2 s persistence threshold, so they were recompiled every process."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", host_keyed_cache_dir(base))
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_secs
        )
    except Exception:
        pass
    return None


__all__ = ["host_signature", "host_keyed_cache_dir", "enable_persistent_cache"]
