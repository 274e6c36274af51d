#!/usr/bin/env bash
# Run the test suite (CPU, virtual 8-device mesh — see tests/conftest.py).
# The reference's analog (`run_tests.sh`) needed a CUDA GPU + docker; this
# runs anywhere.
set -e
cd "$(dirname "$0")"
exec python -m pytest tests/ -q "$@"
