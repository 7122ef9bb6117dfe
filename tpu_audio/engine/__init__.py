from tpu_audio.engine.params import (
    CCMapping, VoiceParams, ControlPlane, CC_MAX_PREDELAY, CC_MAX_SPEED,
)
from tpu_audio.engine.bank import IRBank
from tpu_audio.engine.monolithic import MonolithicConvolution, MonolithicState
from tpu_audio.engine.partitioned import PartitionedConvolution, PartitionedState
from tpu_audio.engine.fmajor import (
    FMajorBank, FMajorPartitionedConvolution, FMajorState,
)

__all__ = [
    "FMajorBank", "FMajorPartitionedConvolution", "FMajorState",
    "CCMapping", "VoiceParams", "ControlPlane", "CC_MAX_PREDELAY", "CC_MAX_SPEED",
    "IRBank",
    "MonolithicConvolution", "MonolithicState",
    "PartitionedConvolution", "PartitionedState",
]
