from tpu_audio.ops.fft import SpectralTransform
from tpu_audio.ops.hermitian import (
    pack_2r_to_c, unpack_c_to_2r, full_spectrum_from_half, rfft_via_pack,
)
from tpu_audio.ops.mix import pan_gains, delay_and_clamp_add, dry_mix_2x2
from tpu_audio.ops.smoother import slew_spectra, vsteps_decrement
from tpu_audio.ops.partition import (
    num_partitions, partition_ir, partition_spectra, monolithic_spectrum,
)

__all__ = [
    "SpectralTransform",
    "pack_2r_to_c", "unpack_c_to_2r", "full_spectrum_from_half", "rfft_via_pack",
    "pan_gains", "delay_and_clamp_add", "dry_mix_2x2",
    "slew_spectra", "vsteps_decrement",
    "num_partitions", "partition_ir", "partition_spectra", "monolithic_spectrum",
]
