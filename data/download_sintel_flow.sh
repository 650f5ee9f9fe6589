#!/bin/sh
# Download MPI-Sintel complete (optical flow) into data/sintel_flow/
# (~5 GB; equivalent of the reference's data/downloadSintelOpticalFlow.sh)
set -e
mkdir -p sintel_flow
cd sintel_flow
wget -c http://files.is.tue.mpg.de/sintel/MPI-Sintel-complete.zip
unzip -n MPI-Sintel-complete.zip
