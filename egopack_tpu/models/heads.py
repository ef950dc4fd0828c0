"""Per-task projection heads: AR, OSCC, LTA, PNR.

Each head mirrors its reference counterpart in /root/reference/models/tasks/:

- shared projection MLP Dropout→Linear→LN→ReLU→Linear (task.py:17-23)
- AR/LTA: one (Dropout→Linear) classifier per label head, auxiliary classifier
  sets per EgoPack task, late-fusion = per-head stack of [primary, *aux] logits
  summed (or averaged) (recognition.py:44-57, lta.py:39-57)
- OSCC: masked global-max pool over nodes then a 2-way classifier; aux logits
  pooled the same way (oscc.py:65-86)
- PNR: per-node scalar logit; fusion stacks (B·N, 1) logits (pnr.py:62-74)

All methods take dense ``(B, N, F)`` features; losses return per-element
values, reduced by the caller with the reference's mean-over-everything rule.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.losses import bce_with_logits, cross_entropy, sigmoid_focal_loss
from .layers import LayerNorm, TLinear


class _Classifier(nn.Module):
    """Dropout → Linear classifier head (reference _build_classifier)."""

    out_features: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return TLinear(self.out_features)(x)


class ProjectionTask(nn.Module):
    """Base projection MLP shared by all task heads."""

    name_: str = "task"
    input_size: int = 1024
    features_size: int = 1024
    dropout: float = 0.0

    @property
    def task_name(self) -> str:
        return self.name_

    @nn.compact
    def project(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Dropout(self.dropout, deterministic=not train, name="proj_drop")(x)
        x = TLinear(self.features_size, name="proj_fc0")(x)
        x = LayerNorm(name="proj_ln")(x)
        x = nn.relu(x)
        return TLinear(self.features_size, name="proj_fc1")(x)

    def forward_features(self, x: jax.Array, train: bool = False) -> jax.Array:
        return self.project(x, train)

    def __call__(self, x: jax.Array, node_mask: Optional[jax.Array] = None,
                 train: bool = False):
        """Full param-covering path (init convenience): features → logits,
        touching the auxiliary classifiers when configured."""
        feats = self.forward_features(x, train)
        aux = ({t: feats for t in self.aux_tasks}
               if getattr(self, "aux_tasks", None) else None)
        return self.forward_logits(feats, node_mask, aux, train)


def _fuse(stacked: jax.Array, average: bool) -> jax.Array:
    return stacked.mean(0) if average else stacked.sum(0)


class RecognitionTask(ProjectionTask):
    """AR: multi-head (verb, noun) classification (recognition.py:10-72)."""

    heads: Tuple[int, ...] = (1, 1)
    head_dropout: float = 0.0
    aux_tasks: Optional[Tuple[str, ...]] = None
    average_logits: bool = False

    def setup(self):
        self.classifiers = [_Classifier(h, self.head_dropout, name=f"cls{i}")
                            for i, h in enumerate(self.heads)]
        if self.aux_tasks:
            self.aux_classifiers = {
                t: [_Classifier(h, self.head_dropout, name=f"aux_{t}_cls{i}")
                    for i, h in enumerate(self.heads)]
                for t in self.aux_tasks
            }

    def forward_logits(self, features: jax.Array,
                       node_mask: Optional[jax.Array] = None,
                       aux_features: Optional[Dict[str, jax.Array]] = None,
                       train: bool = False) -> Tuple[jax.Array, ...]:
        logits = tuple(c(features, train) for c in self.classifiers)
        if aux_features is not None:
            aux_logits = [self.forward_aux_logits(f, t, train)
                          for t, f in aux_features.items()]
            logits = tuple(
                _fuse(jnp.stack([primary, *per_task]), self.average_logits)
                for primary, *per_task in zip(logits, *aux_logits))
        return logits

    def forward_aux_logits(self, features: jax.Array, task: str,
                           train: bool = False) -> Tuple[jax.Array, ...]:
        return tuple(c(features, train) for c in self.aux_classifiers[task])

    def compute_loss(self, logits: Sequence[jax.Array], targets: jax.Array):
        """Sum of per-head CE (ignore −1); targets (..., num_heads)."""
        losses = [cross_entropy(l, targets[..., i])
                  for i, l in enumerate(logits)]
        return jnp.stack(losses).sum(0)


class LTATask(RecognitionTask):
    """LTA: per-node (verb, noun) heads + categorical sequence sampling
    (lta.py:10-74)."""

    def generate_from_logits(self, logits: Sequence[jax.Array],
                             rng: jax.Array, K: int = 5):
        """K categorical samples per node per head (lta.py:63-71)."""
        predictions = []
        for i, head_logits in enumerate(logits):
            keys = jax.random.split(jax.random.fold_in(rng, i), K)
            samples = [jax.random.categorical(k, head_logits, axis=-1)
                       for k in keys]
            predictions.append(jnp.stack(samples, axis=-1))  # (..., K)
        return predictions, tuple(logits)


class OSCCTask(ProjectionTask):
    """OSCC: graph-max-pooled binary classification (oscc.py:16-96)."""

    head_dropout: float = 0.0
    loss_func: str = "ce"
    aux_tasks: Optional[Tuple[str, ...]] = None
    average_logits: bool = False

    def setup(self):
        self.classifier = _Classifier(2, self.head_dropout, name="cls")
        if self.aux_tasks:
            self.aux_classifiers = {
                t: _Classifier(2, self.head_dropout, name=f"aux_{t}_cls")
                for t in self.aux_tasks
            }

    @staticmethod
    def _pool(features: jax.Array, node_mask: Optional[jax.Array]) -> jax.Array:
        # global max pool over nodes (oscc.py:68); masked for padded nodes
        if node_mask is not None:
            neg = jnp.finfo(features.dtype).min
            features = jnp.where(node_mask[..., None], features, neg)
        return features.max(axis=-2)

    def forward_logits(self, features: jax.Array,
                       node_mask: Optional[jax.Array] = None,
                       aux_features: Optional[Dict[str, jax.Array]] = None,
                       train: bool = False) -> jax.Array:
        logits = self.classifier(self._pool(features, node_mask), train)
        if aux_features is not None:
            aux = [self.forward_aux_logits(f, node_mask, t, train)
                   for t, f in aux_features.items()]
            logits = _fuse(jnp.stack([logits, *aux]), self.average_logits)
        return logits

    def forward_aux_logits(self, features: jax.Array,
                           node_mask: Optional[jax.Array], task: str,
                           train: bool = False) -> jax.Array:
        return self.aux_classifiers[task](self._pool(features, node_mask), train)

    def compute_loss(self, logits: jax.Array, targets: jax.Array) -> jax.Array:
        if self.loss_func == "ce":
            # phase-2 label smoothing (oscc.py:90); phase-1 uses the plain CE
            # criterion from the trainer, not this method
            return cross_entropy(logits, targets, label_smoothing=0.1)
        one_hot = jax.nn.one_hot(jnp.maximum(targets, 0), 2)
        if self.loss_func == "bce":
            return bce_with_logits(logits, one_hot).mean(-1)
        if self.loss_func == "focal":
            return sigmoid_focal_loss(logits, one_hot).mean(-1)
        raise ValueError(f"Unknown OSCC loss: {self.loss_func}")


class PNRTask(ProjectionTask):
    """PNR: per-node scalar keyframe logit (pnr.py:12-83)."""

    head_dropout: float = 0.0
    aux_tasks: Optional[Tuple[str, ...]] = None
    average_logits: bool = False

    def setup(self):
        self.classifier = _Classifier(1, self.head_dropout, name="cls")
        if self.aux_tasks:
            self.aux_classifiers = {
                t: _Classifier(1, self.head_dropout, name=f"aux_{t}_cls")
                for t in self.aux_tasks
            }

    def forward_logits(self, features: jax.Array,
                       node_mask: Optional[jax.Array] = None,
                       aux_features: Optional[Dict[str, jax.Array]] = None,
                       train: bool = False) -> jax.Array:
        logits = self.classifier(features, train)  # (B, N, 1)
        if aux_features is not None:
            aux = [self.forward_aux_logits(f, t, train)
                   for t, f in aux_features.items()]
            logits = _fuse(jnp.stack([logits, *aux]), self.average_logits)
        return logits[..., 0]  # squeeze (pnr.py:74)

    def forward_aux_logits(self, features: jax.Array, task: str,
                           train: bool = False) -> jax.Array:
        return self.aux_classifiers[task](features, train)

    def compute_loss(self, logits: jax.Array, targets: jax.Array) -> jax.Array:
        return bce_with_logits(logits, targets.astype(jnp.float32))
