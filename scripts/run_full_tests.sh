#!/bin/sh
# The FULL local test gate: everything, including suites marked `slow`
# (excluded from the default profile so the external driver's
# time-boxed `pytest tests/ -x -q` completes — see pytest.ini).
exec python -m pytest tests/ -m "" -q "$@"
