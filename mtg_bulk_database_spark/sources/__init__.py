from .scryfall import (  # noqa: F401
    BULK_DATA_URL,
    SETS_URL,
    pick_bulk_entry,
    read_cards_json,
    read_sets_dataframe,
)
