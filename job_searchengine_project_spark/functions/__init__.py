from job_searchengine_project_spark.functions.cleaning import (  # noqa: F401
    clean_text_banner,
    clean_text_body,
    clean_ocr_text,
    clean_body_col,
    clean_banner_col,
)
from job_searchengine_project_spark.functions.extract import (  # noqa: F401
    extract_text,
    extract_text_py,
)
from job_searchengine_project_spark.functions.tokenize import (  # noqa: F401
    tokenize_morph,
    tokenize_morph_py,
    tokenize_2gram,
    tokenize_2gram_py,
    term_freqs,
)
