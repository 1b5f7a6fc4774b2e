from matdeeplearn_tpu.utils.results import write_errorvalues, write_results  # noqa: F401
from matdeeplearn_tpu.utils.summary import model_summary  # noqa: F401
