"""Environment-variable flag system.

Role of the reference's ``auto_round/envs.py`` (vLLM-style lazy
``environment_variables`` dict): every knob is a named lazy accessor so
``import autoround_tpu.envs as envs; envs.AR_LOG_LEVEL`` reads the
current process environment at access time.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict

environment_variables: Dict[str, Callable[[], Any]] = {
    # logging level for the package logger (TRACE/DEBUG/INFO/...)
    "AR_LOG_LEVEL": lambda: os.environ.get("AR_LOG_LEVEL", "INFO"),
    # crash-resume directory (see utils/resume.py)
    "AR_RESUME_DIR": lambda: os.environ.get("AR_RESUME_DIR"),
    # worker processes for the model-free shard compressor
    "AR_MODEL_FREE_SHARD_PARALLELISM": lambda: int(
        os.environ.get("AR_MODEL_FREE_SHARD_PARALLELISM", "1")),
    # enable tuning of activation static scales (reference parity flag)
    "AR_ENABLE_ACT_MINMAX_TUNING": lambda: os.environ.get(
        "AR_ENABLE_ACT_MINMAX_TUNING", "0") == "1",
    # scratch/workspace directory
    "AR_WORK_SPACE": lambda: os.environ.get("AR_WORK_SPACE", "/tmp/ar_tpu"),
    # memory log verbosity (per-block memory summaries)
    "AR_LOG_MEMORY": lambda: os.environ.get("AR_LOG_MEMORY", "0") == "1",
    # jax.profiler trace of the tuning run (utils/profiling.py)
    "AR_TRACE_DIR": lambda: os.environ.get("AR_TRACE_DIR"),
    # MoE serving: capacity-based expert dispatch factor (0 = dense)
    "AR_MOE_CAPACITY_FACTOR": lambda: float(os.environ.get(
        "AR_MOE_CAPACITY_FACTOR", "0")),
    # serving: token count at/above which packed W4/W2/W8 projections
    # switch from the Pallas kernel to a dequant-ONCE XLA path.
    # MEASURED ON THE CHIP (docs/prefill_r04.json A/B): the XLA path is
    # 1.5-2.4x SLOWER at prefill — XLA materializes the bf16 scratch
    # through HBM (write 16 GB + read-back per call) instead of fusing
    # it into the dot, so default 0 = DISABLED (kernel always); the
    # kernel's large prefill batch tiles (TB=1024) carry the win
    # instead.  Kept as an opt-in for future XLA fusion behavior.
    "AR_PREFILL_DEQUANT_TOKENS": lambda: int(os.environ.get(
        "AR_PREFILL_DEQUANT_TOKENS", "0")),
    # persistent XLA compilation cache directory (opt-in): repeat
    # quantization runs re-compile the same tuning executables every
    # time (95-445 s of block-0 compile measured over the tunnel's
    # remote-compile service); pointing this at a directory enables
    # jax's persistent cache for the process (api.AutoRound applies it
    # on construction).  Effectiveness on the axon remote-compile
    # backend is untested — harmless if the backend ignores it.
    "AR_COMPILE_CACHE_DIR": lambda: os.environ.get(
        "AR_COMPILE_CACHE_DIR"),
    # per-phase wall-clock attribution inside quantize_model (adds
    # block_until_ready syncs at phase boundaries — small serialization
    # cost, exact attribution; flagship profiling, docs/flagship_r05)
    "AR_PROFILE_PHASES": lambda: os.environ.get(
        "AR_PROFILE_PHASES", "0") == "1",
    # isolate hub dataset loading in a spawn subprocess (calib_data.py)
    "AR_CALIB_SUBPROCESS": lambda: os.environ.get(
        "AR_CALIB_SUBPROCESS", "0") == "1",
    "AR_CALIB_SUBPROCESS_TIMEOUT": lambda: float(os.environ.get(
        "AR_CALIB_SUBPROCESS_TIMEOUT", "300")),
}


def __getattr__(name: str):
    if name in environment_variables:
        return environment_variables[name]()
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return list(environment_variables)
