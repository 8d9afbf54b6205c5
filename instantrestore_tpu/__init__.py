"""InstantRestore-TPU: a TPU-native (JAX/XLA/Pallas) single-step personalized
face-restoration framework.

Re-designed from scratch with the capabilities of snap-research/InstantRestore
(SIGGRAPH 2025, arXiv 2412.06753): a LoRA-finetuned SD-Turbo UNet + SD VAE that
restores a degraded 512x512 face in ONE UNet forward pass, personalizing via
shared-image attention over ~4 clean reference images of the same identity.

Everything is functional JAX: parameters are pytrees, models are pure
functions, the "frozen original UNet" of the reference is just the same UNet
function applied with base (non-LoRA) parameters in K/V-capture mode, and
shared-image attention is a fused wide-KV attention op (Pallas on TPU).
"""

__version__ = "0.1.0"
