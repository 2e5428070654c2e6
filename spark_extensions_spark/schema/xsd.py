"""XSD → Spark StructType conversion, pure Python (stdlib ElementTree).

Behavioral parity with the reference converter
(`/root/reference/src/main/scala/org/apache/spark/sql/xml/
XsdSchemaConverter.scala:51-269`), re-expressed from its documented
semantics:

- type map (``XsdSchemaConverter.scala:96-121``): xs:boolean→Boolean;
  xs:decimal→Decimal(38, fractionDigits facet, default (38,18));
  xs:unsignedLong→Decimal(38,0); xs:double→Double; xs:float→Float;
  xs:byte→Byte; xs:short / xs:unsignedByte→Short; xs:integer family +
  xs:unsignedShort→Integer; xs:long / xs:unsignedInt→Long; xs:date→Date;
  xs:dateTime→Timestamp; anything else→String.
- ``maxOccurs > 1 | "unbounded"`` → ArrayType (``:195``);
  ``minOccurs == 0`` → nullable (``:196``).
- attributes land as ``_<name>`` columns (``:253``); mixed/simple-content
  element text as ``_VALUE`` (``:138``); wildcard ``xs:any`` as an
  ``xs_any`` string column (``:214-217``, ``:279``).
- ``xs:attributeGroup`` definitions expand inline (``:225-234``).
- recursive element/type references bounded by ``max_recursion``
  (``:131``): past the cap the subtree collapses to StringType.
- ``xs:annotation/xs:documentation`` → field metadata ``comment``
  (``:236-245``).

These conventions match what Spark's native XML reader (``from_xml`` /
``rowTag`` XML source, Spark 4) produces, so the emitted StructType plugs
straight into that reader.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    ByteType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

XSD_NS = "http://www.w3.org/2001/XMLSchema"


def _tag(el: ET.Element) -> str:
    """Local name of an element's tag (strip the XSD namespace)."""
    t = el.tag
    return t.split("}", 1)[1] if t.startswith("{") else t


def _local(name: str | None) -> str | None:
    """Local part of a possibly-prefixed QName like ``xs:string``."""
    if name is None:
        return None
    return name.split(":", 1)[1] if ":" in name else name


_SIMPLE_TYPES: dict[str, DataType] = {
    "boolean": BooleanType(),
    "unsignedLong": DecimalType(38, 0),
    "double": DoubleType(),
    "float": FloatType(),
    "byte": ByteType(),
    "short": ShortType(),
    "unsignedByte": ShortType(),
    "int": IntegerType(),
    "integer": IntegerType(),
    "negativeInteger": IntegerType(),
    "nonNegativeInteger": IntegerType(),
    "nonPositiveInteger": IntegerType(),
    "positiveInteger": IntegerType(),
    "unsignedShort": IntegerType(),
    "long": LongType(),
    "unsignedInt": LongType(),
    "date": DateType(),
    "dateTime": TimestampType(),
}


class XsdConversionError(ValueError):
    pass


def xsd_to_spark(xsd: str, max_recursion: int = 10) -> StructType:
    """Convert an XSD document (string, or a path to one) to a StructType.

    The result maps each top-level ``xs:element``: a single global element
    of complex type yields its struct directly (the shape Spark's XML
    reader produces for that ``rowTag``); multiple global elements yield
    one field per element.
    """
    if "\n" not in xsd and os.path.exists(xsd):
        with open(xsd, encoding="utf-8") as f:
            xsd = f.read()
    try:
        root = ET.fromstring(xsd)
    except ET.ParseError as e:
        raise XsdConversionError(f"invalid XSD document: {e}") from e
    if _tag(root) != "schema":
        raise XsdConversionError(f"expected xs:schema root, got <{_tag(root)}>")
    conv = _Converter(root, max_recursion)
    return conv.convert()


class _Converter:
    def __init__(self, schema: ET.Element, max_recursion: int):
        self.schema = schema
        self.max_recursion = max_recursion
        self.complex_types: dict[str, ET.Element] = {}
        self.simple_types: dict[str, ET.Element] = {}
        self.attribute_groups: dict[str, ET.Element] = {}
        self.global_elements: dict[str, ET.Element] = {}
        for child in schema:
            tag, name = _tag(child), child.get("name")
            if name is None:
                continue
            if tag == "complexType":
                self.complex_types[name] = child
            elif tag == "simpleType":
                self.simple_types[name] = child
            elif tag == "attributeGroup":
                self.attribute_groups[name] = child
            elif tag == "element":
                self.global_elements[name] = child

    def convert(self) -> StructType:
        elements = [c for c in self.schema if _tag(c) == "element"]
        if not elements:
            raise XsdConversionError("XSD has no top-level xs:element")
        if len(elements) == 1:
            dt, _, _ = self._element_type(elements[0], depth={})
            if isinstance(dt, StructType):
                return dt
            el = elements[0]
            return StructType(
                [StructField(el.get("name", "value"), dt, True)]
            )
        fields = []
        for el in elements:
            dt, nullable, comment = self._element_type(el, depth={})
            fields.append(
                _field(el.get("name", "value"), dt, nullable, comment)
            )
        return StructType(fields)

    # -- resolution helpers ------------------------------------------------

    def _doc_comment(self, el: ET.Element) -> str | None:
        """xs:annotation/xs:documentation text → comment metadata."""
        for ann in el:
            if _tag(ann) == "annotation":
                for doc in ann:
                    if _tag(doc) == "documentation" and doc.text:
                        return " ".join(doc.text.split())
        return None

    def _simple_type_of(self, name: str, depth: dict[str, int]) -> DataType:
        if name in _SIMPLE_TYPES:
            return _SIMPLE_TYPES[name]
        if name == "decimal":
            return DecimalType(38, 18)
        if name in self.simple_types:
            return self._restriction_type(self.simple_types[name], depth)
        return StringType()

    def _restriction_type(self, st: ET.Element, depth: dict[str, int]) -> DataType:
        """xs:simpleType → base type, honoring the fractionDigits facet."""
        for child in st:
            tag = _tag(child)
            if tag == "restriction":
                base = _local(child.get("base")) or "string"
                if base == "decimal":
                    scale = 18
                    for facet in child:
                        if _tag(facet) == "fractionDigits":
                            scale = int(facet.get("value", "18"))
                    return DecimalType(38, scale)
                return self._simple_type_of(base, depth)
            if tag in ("list", "union"):
                return StringType()
        return StringType()

    # -- element / complexType traversal ----------------------------------

    def _element_type(
        self, el: ET.Element, depth: dict[str, int]
    ) -> tuple[DataType, bool, str | None]:
        """Returns (dataType, nullable, comment) for one xs:element."""
        comment = self._doc_comment(el)

        ref = _local(el.get("ref"))
        if ref is not None:
            if ref in self.global_elements:
                n = depth.get(f"el:{ref}", 0)
                if n >= self.max_recursion:
                    return StringType(), True, comment
                inner = dict(depth)
                inner[f"el:{ref}"] = n + 1
                dt, _, ref_comment = self._element_type(
                    self.global_elements[ref], inner
                )
                return dt, _nullable_of(el), comment or ref_comment
            return StringType(), _nullable_of(el), comment

    # named type reference
        tname = _local(el.get("type"))
        if tname is not None:
            if tname in self.complex_types:
                n = depth.get(f"ct:{tname}", 0)
                if n >= self.max_recursion:
                    return StringType(), _nullable_of(el), comment
                inner = dict(depth)
                inner[f"ct:{tname}"] = n + 1
                dt = self._complex_type(self.complex_types[tname], inner)
                return dt, _nullable_of(el), comment
            return self._simple_type_of(tname, depth), _nullable_of(el), comment

        # inline type definition
        for child in el:
            tag = _tag(child)
            if tag == "complexType":
                return self._complex_type(child, depth), _nullable_of(el), comment
            if tag == "simpleType":
                return self._restriction_type(child, depth), _nullable_of(el), comment
        return StringType(), _nullable_of(el), comment

    def _complex_type(self, ct: ET.Element, depth: dict[str, int]) -> DataType:
        fields: list[StructField] = []
        has_value_text = False
        value_type: DataType = StringType()

        def walk_particle(node: ET.Element) -> None:
            nonlocal has_value_text, value_type
            for child in node:
                tag = _tag(child)
                if tag in ("sequence", "choice", "all"):
                    walk_particle(child)
                elif tag == "element":
                    dt, nullable, comment = self._element_type(child, depth)
                    name = child.get("name") or _local(child.get("ref")) or "value"
                    if _is_array(child):
                        dt = ArrayType(dt, containsNull=nullable)
                        nullable = _min_occurs(child) == 0
                    # inside xs:choice every branch is optional
                    if _tag(node) == "choice":
                        nullable = True
                    fields.append(_field(name, dt, nullable, comment))
                elif tag == "any":
                    # wildcard content → xs_any string column (ref :214-217)
                    fields.append(StructField("xs_any", StringType(), True))
                elif tag == "simpleContent":
                    for ext in child:
                        if _tag(ext) in ("extension", "restriction"):
                            base = _local(ext.get("base")) or "string"
                            has_value_text = True
                            value_type = self._simple_type_of(base, depth)
                            walk_attributes(ext)
                elif tag == "complexContent":
                    for ext in child:
                        if _tag(ext) in ("extension", "restriction"):
                            base = _local(ext.get("base"))
                            if base in self.complex_types:
                                n = depth.get(f"ct:{base}", 0)
                                if n < self.max_recursion:
                                    inner = dict(depth)
                                    inner[f"ct:{base}"] = n + 1
                                    base_dt = self._complex_type(
                                        self.complex_types[base], inner
                                    )
                                    if isinstance(base_dt, StructType):
                                        fields.extend(base_dt.fields)
                            walk_particle(ext)
                            walk_attributes(ext)

        def walk_attributes(node: ET.Element) -> None:
            for child in node:
                tag = _tag(child)
                if tag == "attribute":
                    aname = child.get("name") or _local(child.get("ref")) or "attr"
                    tname = _local(child.get("type"))
                    if tname is not None:
                        adt = self._simple_type_of(tname, depth)
                    else:
                        adt = StringType()
                        for sub in child:
                            if _tag(sub) == "simpleType":
                                adt = self._restriction_type(sub, depth)
                    required = child.get("use") == "required"
                    # attributes prefixed with '_' (ref :253)
                    fields.append(
                        _field(f"_{aname}", adt, not required,
                               self._doc_comment(child))
                    )
                elif tag == "attributeGroup":
                    gref = _local(child.get("ref"))
                    if gref in self.attribute_groups:
                        walk_attributes(self.attribute_groups[gref])

        if ct.get("mixed") == "true":
            has_value_text = True
        walk_particle(ct)
        walk_attributes(ct)

        if not fields:
            # simple content only: collapse to the value type itself
            return value_type
        if has_value_text:
            # element text alongside attributes → _VALUE column (ref :138)
            fields.append(StructField("_VALUE", value_type, True))
        return StructType(fields)


def _min_occurs(el: ET.Element) -> int:
    return int(el.get("minOccurs", "1"))


def _is_array(el: ET.Element) -> bool:
    mx = el.get("maxOccurs", "1")
    return mx == "unbounded" or int(mx) > 1


def _nullable_of(el: ET.Element) -> bool:
    return _min_occurs(el) == 0 or el.get("nillable") == "true"


def _field(
    name: str, dt: DataType, nullable: bool, comment: str | None
) -> StructField:
    metadata = {"comment": comment} if comment else None
    return StructField(name, dt, nullable, metadata=metadata)
