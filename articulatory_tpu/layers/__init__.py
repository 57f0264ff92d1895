from articulatory_tpu.layers.conv import (  # noqa: F401
    Conv1d,
    ConvTranspose1d,
    Conv2d,
    Dense,
    Embed,
    CausalConv1d,
    CausalConvTranspose1d,
)
from articulatory_tpu.layers.residual import (  # noqa: F401
    HiFiGANResidualBlock,
    WaveNetResidualBlock,
    MelGANResidualStack,
    ResBlock,
    GBlock,
)
from articulatory_tpu.layers.past_encoder import PastFCEncoder, PastSeqEncoder  # noqa: F401
from articulatory_tpu.layers.upsample import (  # noqa: F401
    UpsampleNetwork,
    ConvInUpsampleNetwork,
    stretch_time,
)
from articulatory_tpu.layers.tade import TADELayer, TADEResBlock  # noqa: F401
from articulatory_tpu.layers.transformer import (  # noqa: F401
    TransformerEncoderLayer,
    MultiHeadAttention,
)
from articulatory_tpu.layers.activations import get_activation  # noqa: F401

