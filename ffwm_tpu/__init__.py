"""ffwm_tpu — a TPU-native face-frontalization framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of csyxwei/FFWM
("Learning Flow-based Feature Warping for Face Frontalization with Illumination
Inconsistent Supervision", ECCV 2020): forward/reverse FlowNets, the FFWM
generator with Warp Attention Modules, LightCNN identity supervision, the full
GAN + illumination training stack, and Multi-PIE/LFW evaluation — re-designed
for TPU (NHWC layouts, jitted train steps, GSPMD data parallelism over a
`jax.sharding.Mesh`, Pallas kernels for the hot warping ops).

Layout:
    ffwm_tpu.nn        torch-compatible layer library (Conv/ConvT/BN/SN/...)
    ffwm_tpu.ops       differentiable image ops (warp, resize, guided filter,
                       resample2d, block_extractor, local_attn_reshape)
    ffwm_tpu.models    FlowNet, FFWM generator, MSDiscriminator, LightCNN, VGG19
    ffwm_tpu.losses    GAN / perceptual / identity / illumination / landmark /
                       affine-regularization / perceptual-correctness losses
    ffwm_tpu.data      Multi-PIE / LFW datasets, preprocessing, synthetic data
    ffwm_tpu.engine    jitted train/eval steps, checkpointing, schedules
    ffwm_tpu.parallel  mesh + sharding helpers
    ffwm_tpu.utils     torch<->jax checkpoint conversion, metrics, visualizer
"""

__version__ = "0.1.0"
