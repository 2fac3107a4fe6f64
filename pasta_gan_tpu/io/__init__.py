"""Checkpoints + converters."""

from .checkpoints import load_snapshot, restore_train_state, save_snapshot, save_train_state
