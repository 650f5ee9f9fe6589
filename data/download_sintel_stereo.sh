#!/bin/sh
# Download MPI-Sintel stereo into data/sintel_stereo/
# (~2 GB; equivalent of the reference's data/downloadSintelStereo.sh)
set -e
mkdir -p sintel_stereo
cd sintel_stereo
wget -c http://files.is.tue.mpg.de/sintel/MPI-Sintel-stereo-training-20150305.zip
unzip -n MPI-Sintel-stereo-training-20150305.zip
