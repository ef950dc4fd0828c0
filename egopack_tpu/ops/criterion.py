"""Criterion selection over multi-label logits.

Mirrors ``MetricSelectorWrapper`` (/root/reference/criterion/wrapper.py:11-82):
a dataset may annotate samples with several separate labels (verb, noun) and
optionally a *joint* label (e.g. EK100 actions). The wrapper routes a base
criterion over the logit tuple:

- joint label present + ``joint_label_training``: criterion on the joint head
- joint label present, flag off: criterion on every head except the joint one
- no joint label (Ego4D): criterion on all heads, summed per-sample
"""

from __future__ import annotations

import logging
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from .losses import cross_entropy

logger = logging.getLogger(__name__)


class MetricSelectorWrapper:
    """Functional port: ``wrapper(logits_tuple, targets) -> per-element loss``.

    ``criterion(logits, labels) -> per-element loss`` defaults to plain CE
    with ignore −1 (the reference always wraps
    ``CrossEntropyLoss(reduction='none', ignore_index=-1)``,
    main_temporal.py:287-296)."""

    def __init__(self, criterion: Callable = cross_entropy, dataset=None,
                 joint_label_training: bool = False):
        if dataset is not None and not dataset.has_joint_label \
                and joint_label_training:
            logger.warning("joint_label_training=True but the dataset has no "
                           "joint label")
            joint_label_training = False
        self.criterion = criterion
        self.dataset = dataset
        self.joint_label = joint_label_training

    def __call__(self, logits: Sequence[jax.Array], targets: jax.Array
                 ) -> jax.Array:
        num_labels = targets.shape[-1]
        if len(logits) != num_labels:
            raise ValueError("The number of predictions must match the number "
                             "of ground truth labels")
        has_joint = self.dataset is not None and self.dataset.has_joint_label
        if has_joint:
            if self.joint_label:
                losses = [self.criterion(logits[-1], targets[..., -1])]
            else:
                losses = [self.criterion(logits[i], targets[..., i])
                          for i in range(num_labels - 1)]
        else:
            losses = [self.criterion(logits[i], targets[..., i])
                      for i in range(num_labels)]
        return jnp.stack(losses).sum(0)
