#!/bin/sh
# Render the dataset described by a config.
# With a .blend scene + Blender installed:
#   blender $1 --background -noaudio --python data/create_dataset.py -- $2
# Without Blender this falls back to the analytic swatch backend:
#   sh data/create_dataset.sh - data/configs/config_carpet.py
if [ "$1" = "-" ]; then
    python data/create_dataset.py "$2"
else
    blender "$1" --background -noaudio --python data/create_dataset.py -- "$2"
fi
