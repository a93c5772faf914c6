"""samu_ocr_extraction_poc_spark — a from-scratch PySpark-native
legal-document extraction engine with the capabilities of
Samu-Legal-Technology/samu-ocr-extraction-poc.

The reference is an AWS CDK app (Lambda + Textract + Comprehend + DynamoDB);
this package re-expresses every dataflow transform it performs as a pure
batch DataFrame job: one Arrow-batched extraction stage over
``documents(doc_id string, spans array<struct<kind,text,media_ref,offset>>)``
plus JVM-side (Catalyst-optimised) formulations of every SQL-expressible
operator. See SURVEY.md for the operator inventory and file:line parity map.
"""

__version__ = "0.1.0"
