"""Guidance stack: Flax Stable Diffusion (UNet/VAE/CLIP text) + SDS loss,
CLIP view matching, and Custom Diffusion concept tuning.

Replaces the reference's diffusers/torch guidance (``nerf/sd.py``,
``nerf/clip.py``, ``custom_diffusion/``) with native Flax modules so the
render → VAE → UNet → SDS-grad → backprop loop stays in one XLA program on
chip (SURVEY.md §7 step 6).
"""
