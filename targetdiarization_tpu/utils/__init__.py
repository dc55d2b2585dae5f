from .audio_io import read_audio, write_audio  # noqa: F401
