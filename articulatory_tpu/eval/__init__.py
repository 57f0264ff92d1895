from articulatory_tpu.eval.mcd import mel_cepstral_distortion  # noqa: F401
