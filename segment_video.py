"""Top-level drop-in for the reference's ``python segment_video.py ...``
entry point (reference repo root segment_video.py).  Thin shim over
cut_detection_tpu.cli.segment_video.
"""

from cut_detection_tpu.cli.segment_video import main

if __name__ == "__main__":
    main()
