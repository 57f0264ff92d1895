from articulatory_tpu.data.datasets import (  # noqa: F401
    SpeechDataset,
    MelArtDataset,
    AudioDataset,
    MelDataset,
    ArtDataset,
    AudioSCPDataset,
    MelSCPDataset,
    ArtSCPDataset,
)
from articulatory_tpu.data.collate import (  # noqa: F401
    SpeechCollater,
    CollaterMelArt,
    Collater,
    combine_fixed_length,
)
from articulatory_tpu.data.samplers import SizeAwareSampler  # noqa: F401
from articulatory_tpu.data.loader import DataLoader  # noqa: F401
from articulatory_tpu.data.multimodal import (  # noqa: F401
    WavArtMultDataset,
    ArtSCPMultDataset,
    SpeechCollaterMult,
)
