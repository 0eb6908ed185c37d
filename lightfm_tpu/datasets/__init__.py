from lightfm_tpu.datasets.movielens import fetch_movielens  # noqa: F401
from lightfm_tpu.datasets.stackexchange import fetch_stackexchange  # noqa: F401
from lightfm_tpu.datasets.synthetic import generate_synthetic  # noqa: F401
