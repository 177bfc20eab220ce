"""autoround_tpu — TPU-native AutoRound: post-training quantization in JAX.

Brand-new implementation of the capabilities of intel/auto-round
(reference mounted at /root/reference), designed TPU-first: pure-function
fake-quant simulators, a jitted scan-over-steps sign-SGD tuning loop,
pjit/shard_map parallelism over device meshes, and Pallas serving kernels.
"""

__version__ = "0.1.0"

from .api import (
    AutoRound,
    AutoRoundAdam,
    AutoRoundDiffusion,
    AutoRoundLLM,
    AutoRoundMLLM,
)
from .quantize.auto_scheme import AutoScheme
from .schemes import PRESET_SCHEMES, QuantizationScheme, parse_scheme

__all__ = ["AutoRound", "AutoRoundLLM", "AutoRoundMLLM", "AutoRoundDiffusion",
           "AutoRoundAdam", "AutoScheme", "QuantizationScheme",
           "PRESET_SCHEMES", "parse_scheme", "__version__"]
