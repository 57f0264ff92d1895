from articulatory_tpu.utils.io import (  # noqa: F401
    read_hdf5,
    write_hdf5,
    find_files,
    read_wav,
    write_wav,
    HDF5ScpLoader,
    NpyScpLoader,
)


def __getattr__(name):
    # lazy aliases mirroring the reference's `from articulatory.utils import
    # load_model / download_pretrained_model` API (avoids a circular import
    # with the models package)
    if name == "load_model":
        from articulatory_tpu.inference import load_model

        return load_model
    if name in ("download_pretrained_model", "PRETRAINED_MODEL_LIST"):
        from articulatory_tpu.utils import pretrained

        return getattr(pretrained, name)
    raise AttributeError(f"module 'articulatory_tpu.utils' has no attribute {name!r}")
