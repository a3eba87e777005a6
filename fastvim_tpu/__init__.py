"""FastVim-TPU: a TPU-native (JAX/XLA/Pallas) Fast Vision Mamba framework.

Re-designed from scratch with the capabilities of the insitro/FastVim
reference (see SURVEY.md): pooled bidirectional selective-scan vision
backbones (FastVim), Vim baselines, MAE self-supervised pretraining
(FastMaskVim), per-channel tokenization for cell imaging (FastChannelVim),
and feature-extractor backbones for segmentation/detection — with training
harnesses, config system, and data-parallel/pjit execution on TPU meshes.
"""

__version__ = "0.1.0"
