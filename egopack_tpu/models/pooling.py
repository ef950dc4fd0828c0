"""Temporal pooling: segments → node embedding.

``TRNPooling`` mirrors /root/reference/models/temporal_pooling/trn_pooling.py:
10-45 — flatten the S segment features of each node and run a 3-layer MLP
(Linear→LN→ReLU→Dropout ×2, final Linear). The optional positional/temporal/
learnt encodings of the base class (reference pooling.py:50-90) are provided
for capability parity; the reference experiments never enable them.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import LayerNorm, TLinear, positional_encoding


class TemporalPooling(nn.Module):
    """Base: optional per-frame encoding applied before pooling."""

    input_size: int
    output_size: int
    num_segments: int
    encoding: Optional[str] = None  # 'positional' | 'temporal' | 'learnt' | None
    # None: mixed precision (bf16 matmul inputs, f32 activations).
    # jnp.bfloat16: full activation propagation (see layers.DenseSAGEConv)
    dtype: Optional[jnp.dtype] = None

    def apply_encoding(self, x: jax.Array) -> jax.Array:
        # x: (B, N, S, D) — frame-level encoding over the S axis
        if self.encoding is None:
            return x
        if self.encoding == "learnt":
            table = self.param("frame_encoding", nn.initializers.uniform(1.0),
                               (self.num_segments, self.input_size), jnp.float32)
            enc = TLinear(self.input_size, name="encoding_mlp")(table)
        elif self.encoding == "positional":
            pe = positional_encoding(jnp.arange(self.num_segments, dtype=jnp.float32),
                                     self.input_size)
            enc = TLinear(self.input_size, name="encoding_mlp")(pe)
        elif self.encoding == "temporal":
            # TGAT/GraphMixer functional time encoding cos(t·w),
            # w_i = 1/10000^(i/d) (PyG gnn.TemporalEncoding; unused by the
            # reference experiments, kept for capability parity)
            t = jnp.arange(self.num_segments, dtype=jnp.float32)
            w = 1.0 / (10000.0 ** (jnp.arange(self.input_size) / self.input_size))
            te = jnp.cos(t[:, None] * w[None, :])
            enc = TLinear(self.input_size, name="encoding_mlp")(te)
        else:
            raise ValueError(f"Unsupported encoding: {self.encoding}")
        return x + enc


class TRNPooling(TemporalPooling):
    """TRN-style segment-flatten MLP: (B, N, S·D) → (B, N, output_size)."""

    hidden_size: int = 1024
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = self.apply_encoding(x)
        b, n, s, d = x.shape
        assert s == self.num_segments and d == self.input_size, (
            f"TRNPooling expected (*, {self.num_segments}, {self.input_size}), "
            f"got (*, {s}, {d})")
        h = x.reshape(b, n, s * d)
        for i in range(2):
            h = TLinear(self.hidden_size, dtype=self.dtype, name=f"fc{i}")(h)
            h = LayerNorm(name=f"ln{i}")(h)
            h = nn.relu(h)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return TLinear(self.output_size, dtype=self.dtype, name="fc_out")(h)
