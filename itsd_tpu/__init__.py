"""itsd_tpu — TPU-native framework for *Inference-Time Scaling for Diffusion
Models beyond Scaling Denoising Steps*.

A ground-up JAX/XLA/Pallas re-design with the full capability surface of the
PyTorch reference (DDPM train/sample, classifier-free guidance, noise-search
algorithms + verifiers, FID/IS/CLIP metrics, T-extension fine-tuning,
representation analysis), built SPMD-first over `jax.sharding` meshes.
"""

__version__ = "0.1.0"
