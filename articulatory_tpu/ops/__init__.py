from articulatory_tpu.ops.conv import (  # noqa: F401
    conv1d,
    conv_transpose1d,
    conv1d_output_length,
    conv_transpose1d_output_length,
)
from articulatory_tpu.ops.mel import mel_filterbank, hz_to_mel, mel_to_hz  # noqa: F401
from articulatory_tpu.ops.stft import (  # noqa: F401
    stft_magnitude,
    logmelfilterbank,
    logmelfilterbank_np,
    stft,
    frame_signal,
)
from articulatory_tpu.ops.pqmf import design_prototype_filter, pqmf_filterbanks  # noqa: F401
