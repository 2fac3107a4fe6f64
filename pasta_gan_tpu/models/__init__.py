"""Model registry.

Replaces the reference's reflection-based `dnnlib.util.construct_class_by_name`
(`dnnlib/util.py:222-295`) with an explicit registry keyed by the reference
class names, so configs written against the reference resolve here too.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

from ..nn.discriminator import Discriminator
from .generator_full import GeneratorFull, cat_feats_dict
from .generator_v18 import GeneratorV18

MODEL_REGISTRY: Dict[str, Callable[..., Any]] = {
    # canonical names
    "GeneratorFull": GeneratorFull,
    "GeneratorV18": GeneratorV18,
    "Discriminator": Discriminator,
    # reference-style dotted names (training_options.json compatibility)
    "training.networks.GeneratorFull": GeneratorFull,
    "training.networks.GeneratorV18": GeneratorV18,
    "training.networks.Discriminator": Discriminator,
}


def register_model(name: str, ctor: Callable[..., Any]) -> None:
    MODEL_REGISTRY[name] = ctor


def build_model(class_name: str, **kwargs):
    if class_name not in MODEL_REGISTRY:
        raise KeyError(
            f"unknown model {class_name!r}; known: {sorted(MODEL_REGISTRY)}"
        )
    return MODEL_REGISTRY[class_name](**kwargs)


__all__ = [
    "GeneratorFull",
    "Discriminator",
    "MODEL_REGISTRY",
    "register_model",
    "build_model",
    "cat_feats_dict",
]
