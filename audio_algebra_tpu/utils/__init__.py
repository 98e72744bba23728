"""Host-side utilities: audio IO, chunking, viz data, logging."""

from .audio_io import (  # noqa: F401
    load_audio,
    save_audio,
    read_wav,
    write_wav,
    batch_it_crazy,
    crossfade_flatten,
)
