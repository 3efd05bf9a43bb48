"""On-device signal frontend: kaldi-compatible fbank, mixup, SpecAugment.

Note: the ``fbank`` *function* lives in ``psla_tpu.frontend.fbank`` (module);
it is intentionally not re-exported here to keep the submodule importable.
"""

from psla_tpu.frontend.fbank import (  # noqa: F401
    FbankConfig,
    fbank_batched,
    mel_banks,
    num_frames,
    frontend_matrix,
)
from psla_tpu.frontend.augment import (  # noqa: F401
    spec_augment,
    mixup_waveforms,
    normalize,
)
from psla_tpu.frontend.fbank_pallas import fbank_pallas  # noqa: F401
from psla_tpu.frontend.pipeline import (  # noqa: F401
    PreprocessConfig,
    WavBatch,
    preprocess_train,
    preprocess_eval,
    wav_buffer_length,
)
