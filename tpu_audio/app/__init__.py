from tpu_audio.app.main import main

__all__ = ["main"]
