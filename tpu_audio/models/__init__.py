from tpu_audio.models.reverb import ConvolutionReverb, MultiVoiceReverbServer

__all__ = ["ConvolutionReverb", "MultiVoiceReverbServer"]
