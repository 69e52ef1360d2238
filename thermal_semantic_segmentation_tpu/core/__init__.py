"""Core: checkpointing, PRNG discipline, schedules."""

from .checkpoint import load_checkpoint, maybe_load_torch_checkpoint, save_checkpoint
from .prng import host_rng, split_for_step
from .schedule import ReduceLROnPlateau, poly_lr

__all__ = ["load_checkpoint", "maybe_load_torch_checkpoint", "save_checkpoint",
           "host_rng", "split_for_step", "ReduceLROnPlateau", "poly_lr"]
