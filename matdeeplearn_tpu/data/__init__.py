from matdeeplearn_tpu.data.structures import (  # noqa: F401
    Structure,
    mic_distance_matrix,
    read_ase_db,
    read_structure,
)
from matdeeplearn_tpu.data import graphs  # noqa: F401
from matdeeplearn_tpu.data.dataset import (  # noqa: F401
    DEFAULT_PROCESSING_ARGS,
    GraphDataset,
    get_dataset,
    process_data,
    split_data,
    split_data_CV,
)
from matdeeplearn_tpu.data.batching import (  # noqa: F401
    BatchSpec,
    DeviceDataset,
    GraphBatch,
    assemble_batch,
    batch_iterator,
)
