#!/bin/bash
# Build the native loader core -> native/libysl_loader.so
set -e
cd "$(dirname "$0")/.."
g++ -O3 -shared -fPIC -std=c++17 \
    -I/usr/include/opencv4 \
    native/loader.cc \
    -lopencv_core -lopencv_imgcodecs -lopencv_imgproc -lpthread \
    -o native/libysl_loader.so
echo "built native/libysl_loader.so"
