"""itsd_tpu — TPU-native framework for *Inference-Time Scaling for Diffusion
Models beyond Scaling Denoising Steps*.

A ground-up JAX/XLA/Pallas re-design with the full capability surface of the
PyTorch reference (DDPM train/sample, classifier-free guidance, noise-search
algorithms + verifiers, FID/IS/CLIP metrics, T-extension fine-tuning,
representation analysis), built SPMD-first over `jax.sharding` meshes.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("ITSD_PLATFORM"):
    # This machine's TPU-relay site hook force-selects the axon platform
    # via jax.config at interpreter start, overriding the JAX_PLATFORMS
    # env var — so when the relay is down, ANY device touch hangs in the
    # plugin's retry loop even for CPU-only work. ITSD_PLATFORM=cpu gives
    # scripts (experiments, smoke runs) a working escape hatch, mirroring
    # what tests/conftest.py and __graft_entry__.py already do. Must run
    # before the first backend initialization, which importing itsd_tpu
    # precedes in every entry point.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["ITSD_PLATFORM"])
