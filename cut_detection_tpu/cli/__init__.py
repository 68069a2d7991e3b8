"""Command-line entry points (argparse, ``@argfile`` support like the
reference's ``fromfile_prefix_chars="@"``, segment_video.py:81-83)."""
