#!/usr/bin/env python3
"""Phase-2 EgoPack novel-task training entry point.

CLI-compatible with the reference (/root/reference/main_egopack.py), e.g.::

    python3 main_egopack.py enable_graphone=True enabled_tasks=[oscc] \
        resume_from=MTL_ar-lta-pnr graphone.k=4 graphone.residual=True \
        num_epochs=10 optimizer.lr=1e-6 task_head_dropout=0.5 \
        backprop_temporal_graph=True temporal_graph_train_mode=True
"""

import sys

from egopack_tpu.config import compose, default_config_dir
from egopack_tpu.train.driver import train_egopack


def main(argv=None):
    from egopack_tpu.utils.platform import apply_env_platform
    apply_env_platform()
    cfg = compose(default_config_dir(), "defaults",
                  overrides=argv if argv is not None else sys.argv[1:])
    return train_egopack(cfg)


if __name__ == "__main__":
    main()
