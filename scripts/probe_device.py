#!/usr/bin/env python3
"""Is the accelerator reachable? Exit 0 (prints device + round-trip ms) or
exit 3 after --timeout seconds (default 120).

The tunneled dev chip goes hard-down for multi-hour windows (CLAUDE.md
environment rules) — run this before spending a command window on any TPU
job:

    python scripts/probe_device.py && python bench.py
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=float, default=120.0)
    args = ap.parse_args(argv)

    import threading

    from egopack_tpu.utils.platform import apply_env_platform
    apply_env_platform()  # honor JAX_PLATFORMS despite sitecustomize

    result = {}

    def probe():
        import jax
        import jax.numpy as jnp
        t0 = time.time()
        dev = jax.devices()[0]
        (jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()
        result["dev"] = str(dev)
        result["ms"] = (time.time() - t0) * 1e3

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(args.timeout)
    if "dev" not in result:
        print(f"DOWN: no response in {args.timeout:.0f}s", flush=True)
        return 3
    print(f"UP: {result['dev']} ({result['ms']:.0f} ms round trip)",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
