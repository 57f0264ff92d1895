from articulatory_tpu.losses.stft_loss import MultiResolutionSTFTLoss, STFTLoss  # noqa: F401
from articulatory_tpu.losses.mel_loss import MelSpectrogramLoss  # noqa: F401
from articulatory_tpu.losses.adversarial_loss import (  # noqa: F401
    GeneratorAdversarialLoss,
    DiscriminatorAdversarialLoss,
)
from articulatory_tpu.losses.feat_match_loss import FeatureMatchLoss  # noqa: F401
