#!/usr/bin/env python3
"""Phase-1 MTL training entry point.

CLI-compatible with the reference (/root/reference/main_temporal.py): hydra
``key=value`` overrides against configs/defaults.yaml, e.g.::

    python3 main_temporal.py k=1 model=graph num_epochs=40 batch_size=16 \
        model/temporal_pooling=trn model.temporal_pooling.hidden_size=1024 \
        model.temporal_pooling.dropout=0.5 save_model=True \
        enabled_tasks=[ar,lta,pnr]
"""

import sys

from egopack_tpu.config import compose, default_config_dir
from egopack_tpu.train.driver import train_mtl


def main(argv=None):
    from egopack_tpu.utils.platform import apply_env_platform
    apply_env_platform()
    cfg = compose(default_config_dir(), "defaults",
                  overrides=argv if argv is not None else sys.argv[1:])
    return train_mtl(cfg)


if __name__ == "__main__":
    main()
