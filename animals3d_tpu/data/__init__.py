from animals3d_tpu.data.loaders import DataLoaderConfig, get_data_loaders
