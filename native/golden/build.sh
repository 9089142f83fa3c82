#!/bin/sh
# Build the reference-C++ golden trace generator.
#
# The image has no system Eigen, but tensorflow bundles Eigen 3.4 headers
# (needs -std=c++17); the reference's own CMake only asks for Eigen + a
# C++ compiler for this subset (Common + Components/{Logic,Simulation,
# Offboard}), so the stack compiles unmodified.
set -e
cd "$(dirname "$0")"
REF=/root/reference
EIGEN=/opt/venv/lib/python3.12/site-packages/tensorflow/include
mkdir -p build
g++ -std=c++17 -O2 -o build/trace_gen \
  -I"$EIGEN" -I"$REF/Common" -I"$REF/Components" \
  trace_gen.cpp \
  "$REF/Components/Components/Simulation/Quadcopter_T.cpp" \
  "$REF/Components/Components/Simulation/Motor.cpp" \
  "$REF/Components/Components/Logic/QuadcopterLogic.cpp" \
  "$REF/Components/Components/Logic/KalmanFilter6DOF.cpp" \
  "$REF/Components/Components/Offboard/MocapStateEstimator.cpp" \
  "$REF/Components/Components/Offboard/QuadcopterController.cpp" \
  -lpthread
echo built: build/trace_gen
