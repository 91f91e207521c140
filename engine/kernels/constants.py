"""Keyword sets driving the DOM heuristics.

Verbatim from the reference's ``/root/reference/src/utils/html_utils.py:9-16``
— these sets are observable in outputs (strategy selection, image/link
ladders, navigation suppression) and must be carried exactly
(SURVEY.md §7.4.3).  In the Spark pipeline they are plain module-level
constants captured by the UDF closure (broadcast with the task).
"""

COMMON_ATTRIBUTES = {
    "name", "names", "title", "description", "info", "information",
    "detail", "details", "label",
}
CONTAINER_TAGS = {
    "body", "div", "span", "article", "section", "ul", "ol", "li",
    "figcaption", "figure",
}
TEXT_TAGS = {"p", "h1", "h2", "h3", "h4", "h5", "h6", "a", "span"}
TEXT_PROPERTY_TAGS = {
    "b", "h1", "h2", "h3", "h4", "h5", "h6", "strong", "i", "em", "u",
    "small", "mark", "abbr", "cite",
}
IMAGE_KEYWORDS = {
    "image", "img", "photo", "picture", "thumbnail", "avatar", "logo",
    "icon", "banner",
}
LINK_KEYWORDS = {"link", "url", "website", "web", "site", "websites", "sites"}
NAVIGATION_KEYWORDS = {
    "next", "previous", "prev", "back", "forward", "more", "less",
    "page", "pages",
}
ATTRIBUTES_MAY_CONTAIN_VALUES = {
    "src", "alt", "title", "poster", "type", "kind", "label", "srclang",
    "href", "rel", "content",
}

# Thresholds (ref settings.py:26-27, table_parser.py:28,
# general_parser.py:57, intelligent_parser.py:28-29).
SIMILARITY_THRESHOLD = 0.6
MIN_ATTRIBUTES = 2
# Group acceptance floor (ref general_parser.py:182).
GROUP_CONFIDENCE_FLOOR = 0.4
