"""Unit tests for schema/xsd.py — structural assertions mirroring the
reference's XsdSchemaConverterTest.scala:27-49 (basket/complex/lists
fixtures re-expressed inline)."""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DateType,
    DecimalType,
    IntegerType,
    LongType,
    StringType,
    StructType,
    TimestampType,
)

from spark_extensions_spark.schema.xsd import XsdConversionError, xsd_to_spark

XS = 'xmlns:xs="http://www.w3.org/2001/XMLSchema"'

BASKET = f"""
<xs:schema {XS}>
  <xs:element name="basket">
    <xs:complexType>
      <xs:sequence>
        <xs:element name="entry" maxOccurs="unbounded">
          <xs:complexType>
            <xs:sequence>
              <xs:element name="key" type="xs:string"/>
              <xs:element name="value" type="xs:integer" minOccurs="0"/>
            </xs:sequence>
          </xs:complexType>
        </xs:element>
      </xs:sequence>
      <xs:attribute name="id" type="xs:long" use="required"/>
    </xs:complexType>
  </xs:element>
</xs:schema>
"""


def test_basket():
    st = xsd_to_spark(BASKET)
    assert isinstance(st, StructType)
    entry = st["entry"]
    assert isinstance(entry.dataType, ArrayType)
    inner = entry.dataType.elementType
    assert inner["key"].dataType == StringType() and not inner["key"].nullable
    assert inner["value"].dataType == IntegerType() and inner["value"].nullable
    # attribute prefixed with underscore; use=required → not nullable
    assert st["_id"].dataType == LongType() and not st["_id"].nullable


TYPED = f"""
<xs:schema {XS}>
  <xs:element name="rec">
    <xs:complexType>
      <xs:sequence>
        <xs:element name="flag" type="xs:boolean"/>
        <xs:element name="amount" type="xs:decimal"/>
        <xs:element name="scaled">
          <xs:simpleType>
            <xs:restriction base="xs:decimal">
              <xs:fractionDigits value="2"/>
            </xs:restriction>
          </xs:simpleType>
        </xs:element>
        <xs:element name="big" type="xs:unsignedLong"/>
        <xs:element name="when" type="xs:dateTime"/>
        <xs:element name="day" type="xs:date"/>
        <xs:element name="other" type="xs:anyURI"/>
      </xs:sequence>
    </xs:complexType>
  </xs:element>
</xs:schema>
"""


def test_type_map():
    st = xsd_to_spark(TYPED)
    assert st["flag"].dataType == BooleanType()
    assert st["amount"].dataType == DecimalType(38, 18)  # default scale
    assert st["scaled"].dataType == DecimalType(38, 2)  # fractionDigits facet
    assert st["big"].dataType == DecimalType(38, 0)
    assert st["when"].dataType == TimestampType()
    assert st["day"].dataType == DateType()
    assert st["other"].dataType == StringType()  # unknown → string


COMPLEX = f"""
<xs:schema {XS}>
  <xs:attributeGroup name="versioned">
    <xs:attribute name="version" type="xs:int" use="required"/>
    <xs:attribute name="source" type="xs:string"/>
  </xs:attributeGroup>
  <xs:complexType name="ItemType">
    <xs:sequence>
      <xs:element name="name" type="xs:string"/>
      <xs:element ref="node" minOccurs="0"/>
      <xs:any minOccurs="0"/>
    </xs:sequence>
    <xs:attributeGroup ref="versioned"/>
  </xs:complexType>
  <xs:element name="node">
    <xs:complexType>
      <xs:sequence>
        <xs:element name="item" type="ItemType" maxOccurs="3"/>
      </xs:sequence>
    </xs:complexType>
  </xs:element>
</xs:schema>
"""


def test_refs_attribute_groups_any_recursion():
    st = xsd_to_spark(COMPLEX, max_recursion=2)
    items = st["item"]
    assert isinstance(items.dataType, ArrayType)  # maxOccurs=3 → array
    item = items.dataType.elementType
    assert isinstance(item, StructType)
    assert item["name"].dataType == StringType()
    # attributeGroup expanded inline
    assert item["_version"].dataType == IntegerType()
    assert not item["_version"].nullable
    assert item["_source"].nullable
    # wildcard xs:any → xs_any string column
    assert item["xs_any"].dataType == StringType()
    # recursion (node → item → node) bounded: eventually collapses to string
    dt = item["node"].dataType
    depth = 0
    while isinstance(dt, StructType):
        depth += 1
        elem = dt["item"].dataType
        if isinstance(elem, ArrayType):
            elem = elem.elementType
        dt = elem["node"].dataType if isinstance(elem, StructType) else elem
    assert dt == StringType()
    assert depth <= 3


SIMPLE_CONTENT = f"""
<xs:schema {XS}>
  <xs:element name="price">
    <xs:complexType>
      <xs:simpleContent>
        <xs:extension base="xs:decimal">
          <xs:attribute name="currency" type="xs:string" use="required"/>
        </xs:extension>
      </xs:simpleContent>
    </xs:complexType>
  </xs:element>
</xs:schema>
"""


def test_simple_content_value_column():
    st = xsd_to_spark(SIMPLE_CONTENT)
    assert st["_currency"].dataType == StringType()
    assert st["_VALUE"].dataType == DecimalType(38, 18)


DOCUMENTED = f"""
<xs:schema {XS}>
  <xs:element name="doc">
    <xs:complexType>
      <xs:sequence>
        <xs:element name="title" type="xs:string">
          <xs:annotation>
            <xs:documentation>The document title</xs:documentation>
          </xs:annotation>
        </xs:element>
      </xs:sequence>
    </xs:complexType>
  </xs:element>
</xs:schema>
"""


def test_documentation_comment():
    st = xsd_to_spark(DOCUMENTED)
    assert st["title"].metadata.get("comment") == "The document title"


MULTI = f"""
<xs:schema {XS}>
  <xs:element name="a" type="xs:int"/>
  <xs:element name="b" type="xs:string"/>
</xs:schema>
"""


def test_multiple_top_level_elements():
    st = xsd_to_spark(MULTI)
    assert st["a"].dataType == IntegerType()
    assert st["b"].dataType == StringType()


def test_errors():
    with pytest.raises(XsdConversionError):
        xsd_to_spark("<notxml")
    with pytest.raises(XsdConversionError):
        xsd_to_spark(f"<xs:schema {XS}></xs:schema>")
