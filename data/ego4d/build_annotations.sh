#!/bin/bash
# Symlink an Ego4D release into the layout the data layer expects.
# Equivalent of /root/reference/data/ego4d/build_annotations.sh:1-22.
#
# Resulting structure (run from data/ego4d/):
#   raw/annotations/v<N>/fho_lta_{split}.json, fho_oscc-pnr_{split}.json,
#                        fho_lta_taxonomy.json
#   raw/features/<backbone>/<video_uid>.pt       (converted to
#   processed/features/<backbone>/<video_uid>.npy on first use)

set -e

if [ -z "$1" ]; then
    echo "USAGE ./build_annotations.sh <ego4d_root>"
    echo "EXAMPLE ./build_annotations.sh /storage/ego4d/v2/"
    exit 1
fi

ego4d_root=$1
echo "ego4d_root: $ego4d_root"

mkdir -p raw/annotations
mkdir -p raw/features

ln -sfn "$ego4d_root/annotations" "$(pwd)/raw/"
for backbone in omnivore_image_swinl omnivore_video_swinl slowfast8x8_r101_k400; do
    if [ -d "$ego4d_root/$backbone" ]; then
        ln -sfn "$ego4d_root/$backbone" "$(pwd)/raw/features/"
    fi
done
