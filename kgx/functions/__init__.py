from kgx.functions.normalize import normalize, entity_id, edge_id, claim_id  # noqa: F401
from kgx.functions.html_text import extract_text  # noqa: F401
from kgx.functions.chunker import chunk_text, chunk_token_windows  # noqa: F401
