from .convert import convert_sarif_to_ocsf, ocsf_to_json  # noqa: F401
from .enrich import (  # noqa: F401
    ColumnEnrichment,
    FindingUIDGenerator,
    ScanMetadataEnrichment,
    apply_enrichments,
)
from .landing import land, read_landing  # noqa: F401
from .staging import stage  # noqa: F401
