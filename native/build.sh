#!/bin/sh
# Build libtdaudio.so next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -std=c++17 -o libtdaudio.so tdaudio.cpp -lm
echo "built $(pwd)/libtdaudio.so"
