#!/bin/sh
# Build the reference-planner oracle (DepthImagePlanner compiled unmodified;
# Eigen via tensorflow's bundled headers, OpenCV 4.6 system install).
set -e
cd "$(dirname "$0")"
REF=/root/reference
EIGEN=/opt/venv/lib/python3.12/site-packages/tensorflow/include
mkdir -p build
g++ -std=c++17 -O2 -o build/planner_oracle \
  -I"$EIGEN" -I"$REF/Common" -I"$REF/Components" -I/usr/include/opencv4 \
  planner_oracle.cpp \
  "$REF/Components/Components/DepthImagePlanner/DepthImagePlanner.cpp" \
  "$REF/Components/Components/TrajectoryGenerator/RapidTrajectoryGenerator.cpp" \
  "$REF/Components/Components/TrajectoryGenerator/SingleAxisTrajectory.cpp" \
  -lopencv_core -lpthread
echo built: build/planner_oracle
