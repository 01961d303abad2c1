from .loader import PackedDataset, PackedLoader  # noqa: F401
from .mmearth import MMEarthDataset, find_data_files  # noqa: F401
from .pack import pack_mmearth, pack_split  # noqa: F401
