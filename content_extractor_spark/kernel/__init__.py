"""Pure-Python extraction kernel (no Spark imports).

Everything in this package runs either on the driver (profile loading)
or inside Arrow batch UDFs on executors. Keep it dependency-free.
"""

from .analyzer import (  # noqa: F401
    AnalysisResult,
    RawEntryInformation,
    analyze,
    extract_content,
    extract_date,
    extract_image_url,
    extract_information,
    get_selectors,
)
from .profiles import ProfileConfig, load_profiles, profile_from_dict  # noqa: F401
from .scala_hash import content_hash  # noqa: F401
