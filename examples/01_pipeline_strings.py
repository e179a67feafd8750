#!/usr/bin/env python
"""Pipeline strings — everything the reference's gst-launch examples do.

Run: python examples/01_pipeline_strings.py
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpuvf.cli.launch import launch

# The README pipeline of the reference: NV12 1080p -> BGRA 640x480
launch(
    "videotestsrc num-buffers=30 "
    "! video/x-raw,format=NV12,width=1920,height=1080 "
    "! vfmetalconvertscale ! video/x-raw,format=BGRA,width=640,height=480 "
    "! fakesink")

# A grade + composite, written exactly like gst-launch
launch(
    "vfcompositor name=c background=black sink_1::xpos=480 sink_1::alpha=0.6 "
    "! video/x-raw,format=BGRA ! fakesink "
    "videotestsrc num-buffers=10 ! video/x-raw,format=BGRA,width=640,height=360 "
    "! vfvideofilter contrast=1.2 vignette=0.4 ! c.sink_0 "
    "videotestsrc num-buffers=10 pattern=ball "
    "! video/x-raw,format=NV12,width=320,height=180 ! c.sink_1")
