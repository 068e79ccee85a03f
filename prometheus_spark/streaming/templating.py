"""Alert label/annotation template expansion.

The reference expands rule labels and annotations as Go templates with
the convenience bindings ``$labels``, ``$value``, ``$externalLabels``
and ``$externalURL`` (rules/alerting.go:406-433, template/template.go:299
AlertTemplateData) over the full Prometheus template function map.
The template language itself (pipelines, if/range/with, reReplaceAll,
query, humanize*, ...) is implemented by
:mod:`prometheus_spark.streaming.gotemplate`; this module binds the
alert data shape and mirrors the reference's error behavior: a bad
template renders ``<error expanding template: ...>`` instead of
aborting rule evaluation (rules/alerting.go:427-430).
"""

from __future__ import annotations

from prometheus_spark.streaming.gotemplate import (
    TemplateError,
    go_float_string,
    prometheus_funcs,
    render_template,
)

__all__ = ["expand_template", "go_value_string"]

#: Go %v float rendering (strconv 'g' shortest form) — re-exported under
#: the name earlier rounds used.
go_value_string = go_float_string


def expand_template(
    text: str,
    labels: dict[str, str],
    value: float,
    external_labels: dict[str, str] | None = None,
    external_url: str = "",
    query_fn=None,
    now_seconds: float = 0.0,
) -> str:
    """Expand ``text`` as a Go template with the reference's alert
    bindings: ``.Labels``/``.Value`` struct fields plus the ``$labels``/
    ``$value``/``$externalLabels``/``$externalURL`` shorthand variables
    the reference prepends as assignments (rules/alerting.go:416-425).

    ``query_fn(expr) -> [(labels_dict, value)]`` enables the ``query``
    template function when the caller can evaluate PromQL (the rule
    evaluator passes its engine's instant query)."""
    if "{{" not in text:
        return text
    data = {
        "Labels": dict(labels),
        "ExternalLabels": dict(external_labels or {}),
        "ExternalURL": external_url,
        "Value": value,
    }
    try:
        return render_template(
            text,
            data,
            funcs=prometheus_funcs(
                query_fn=query_fn,
                now_seconds=now_seconds,
                external_url=external_url,
            ),
            extra_vars={
                "labels": data["Labels"],
                "externalLabels": data["ExternalLabels"],
                "externalURL": external_url,
                "value": value,
            },
        )
    except TemplateError as exc:
        return f"<error expanding template: {exc}>"
    except Exception as exc:  # defensive, like the Go recover() wrapper
        return f"<error expanding template: {exc}>"
