from .transform import prepare_cards, prepare_sets  # noqa: F401
from .sink import merge_upsert  # noqa: F401
