"""I/O layer: WAV codec and host-side signal conditioning."""
from .signal_io import export_wav, load_signal
from .wavio import read_wav, write_wav
