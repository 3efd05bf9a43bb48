from psla_tpu.data.datafiles import (  # noqa: F401
    Datafile,
    load_datafile,
    make_index_dict,
    make_name_dict,
    load_label_csv,
)
from psla_tpu.data.wav import read_wav, write_wav  # noqa: F401
from psla_tpu.data.sampler import (  # noqa: F401
    compute_sample_weights,
    gen_weight_file,
    WeightedSampler,
    UniformSampler,
)
from psla_tpu.data.loader import AudioLoader, LoaderConfig  # noqa: F401
