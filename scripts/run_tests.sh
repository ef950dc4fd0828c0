#!/usr/bin/env bash
# Full test suite in sequential groups, each sized to fit a ~10-minute
# command window on the single host core (CLAUDE.md: run groups
# SEQUENTIALLY — parallel runs contend on the one core).
set -e
cd "$(dirname "$0")/.."

run() { echo "== $*"; python -m pytest "$@" -q; }

run tests/test_config.py tests/test_data.py tests/test_meters.py \
    tests/test_models.py tests/test_native_io.py tests/test_pallas_knn.py \
    tests/test_torch_parity.py \
    tests/test_validation.py tests/test_precision.py
run tests/test_train_infra.py tests/test_multihost.py
run tests/test_reference_parity.py
run tests/test_shim_contract.py
run tests/test_multichip.py tests/test_learning.py
run tests/test_end_to_end.py -k "not sweep_runner and not midrun and not trainable and not cold_reload and not novel_task"
run tests/test_end_to_end.py -k "sweep_runner or midrun or trainable or cold_reload"
run tests/test_end_to_end.py -k "novel_task"
echo "ALL GROUPS GREEN"
