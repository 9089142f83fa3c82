#!/bin/sh
# Regenerate the reference-C++ golden traces (then convert to npz with
# `python -m tests._golden_cpp convert`).
#
#   hover_est   demo-faithful config #2: mocap estimator in the loop,
#               hover setpoint (0,0,3.5)       (Rappids_Simulator main.cpp:238)
#   hover_truth config #1: controller fed true plant state
#   step_est    estimator loop + setpoint step (0,0,3.5)->(1,1,2) at t=2s
set -e
cd "$(dirname "$0")"
./build.sh
for d in hover_est hover_truth step_est; do mkdir -p "traces/$d"; done
./build/trace_gen est 5 traces/hover_est
./build/trace_gen truth 5 traces/hover_truth
./build/trace_gen est 5 traces/step_est 0 0 3.5 2.0 1 1 2
