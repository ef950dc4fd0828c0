"""EgoPack-TPU: a TPU-native JAX framework for multi-task egocentric video understanding.

A from-scratch rebuild of the capabilities of sapeirone/EgoPack (CVPR 2024,
"A Backpack Full of Skills") designed TPU-first:

- dense, statically-shaped temporal graphs (no dynamic scatter on the hot path)
- one jitted multi-task train step (4 task branches fused into a single XLA program)
- prototype ("graphone") k-NN interaction as a fused normalize->matmul->top-k op
- data-parallel + model-parallel execution via ``jax.sharding`` meshes
"""

__version__ = "0.1.0"
