from articulatory_tpu.utils.io import (  # noqa: F401
    read_hdf5,
    write_hdf5,
    find_files,
    read_wav,
    write_wav,
    HDF5ScpLoader,
    NpyScpLoader,
)
