-- Committed expected CLI output documents over the reference sample
-- corpus (30 files): sha256 of the byte-faithful ReportJson
-- serialization per file. SF-independent; regenerate from a Verify run
-- after a deliberate parser/serializer change and review the diff.
WITH t(file, family, doc_sha256, doc_chars) AS (VALUES
('aggregate/!example.com!1538204542!1538463818.xml', 'aggregate', '1b502018495deb15dfce420f5068e094f56adcb39c5b78be92a09ae4acfdbe33', 1169),
('aggregate/!large-example.com!1711897200!1711983600.xml', 'aggregate', '032eba361ba7441b6779324fecb2e4b153181d2b3dc66b504284a4d6b3d2ae3e', 1560852),
('aggregate/Report domain- borschow.com Submitter- google.com Report-ID- 949348866075514174.eml', 'aggregate', '8a7d785c87f7bbb8230ad7a6d63583f7f3b2e8d105ee564a83dea94f79b1d75e', 1348),
('aggregate/addisonfoods.com!example.com!1536105600!1536191999.xml', 'aggregate', '62ba2cd614edbb54c436a0ec3cb80812e24f87b9d5afaf1ededbfedd0c0eb7dc', 1342),
('aggregate/empty_reason.xml', 'aggregate', '7dfae304def507948e322deb42521e6b9ccfe62fb82857e7b2ae25605f3c3249', 1582),
('aggregate/estadocuenta1.infonacot.gob.mx!example.com!1536853302!1536939702!2940.xml.zip', 'aggregate', '7d599578fc6b285caf534e9b377c2e7faf2029f804d7fd9a2f619fdcbc6deeeb', 1231),
('aggregate/example.net!example.com!1529366400!1529452799.xml', 'aggregate', '4efd68f7a20c246b519f742d809265237de6726a8d3dd1e5245bbb6a62411098', 1189),
('aggregate/fastmail.com!example.com!1516060800!1516147199!102675056.xml.gz', 'aggregate', '2b46d515d4147f59c335db20a41644c1f032726334fc52a02689c79c22ae0600', 1332),
('aggregate/ikea.com!example.de!1538690400!1538776800.xml', 'aggregate', 'fcb1754c89b66ec23a4dd866579cd5c2dd224da01d0bfe39f438f7f6bebdad68', 1441),
('aggregate/invalid_utf_8.xml', 'aggregate', '15ecbffc8180ffd96cd3e61e5a3a2ae376b3d145a37e2ba7fd58cf4ef6599e44', 1167),
('aggregate/invalid_xml.xml', 'error', '', 0),
('aggregate/mimecast-weird-gzip.eml', 'aggregate', '8e6763440b7421014aa0db55a92a93b31ec0b0b13f96423985c6fb8486ba0656', 1502),
('aggregate/old_draft_from_wiki.xml', 'aggregate', 'eb23e6725b842259ee8f47bca0fb7ecd235e4a842e0bf66c9702d8bbc8f086b5', 1449),
('aggregate/protection.outlook.com!example.com!1711756800!1711843200.xml', 'aggregate', '0be0a53ed0c38dcb177b3e070f95df8efc58154c158de33f9920d4b7274d6c1d', 1328),
('aggregate/twilight.eml', 'aggregate', '852886520f94704d2f49ad55534b59495ceb961503780b3e92347760a4fa7284', 1468),
('aggregate/usssa.com!example.com!1538784000!1538870399.xml', 'aggregate', '337175b9eb7fb539bbae170f0f20f1f50ec64fad7837a1e17881a647fcc0856f', 1858),
('aggregate/veeam.com!example.com!1530133200!1530219600.xml', 'aggregate', '6a18d043366949ea527863c74167a0c90aceda2a2c4ca3d0af66c0c99360c6eb', 1175),
('aggregate_invalid/report_with_upper_cased_pass.xml', 'error', '', 0),
('extract_report/changed-input.xml', 'aggregate', '74fcb3a31b0826b7b4b87e2bc7462990ba25092deffaf1568844bd76e7db1734', 21896),
('extract_report/nice-input.xml', 'aggregate', 'b570fda30a3f2be3a383de57b81d4b823b354c916f59cc263fdeddebcbd9e22f', 21898),
('extract_report/nice-input.xml.gz', 'aggregate', 'b570fda30a3f2be3a383de57b81d4b823b354c916f59cc263fdeddebcbd9e22f', 21898),
('extract_report/nice-input.xml.zip', 'aggregate', 'b570fda30a3f2be3a383de57b81d4b823b354c916f59cc263fdeddebcbd9e22f', 21898),
('forensic/DMARC Failure Report for domain.de (mail-from=sharepoint@domain.de, ip=10.10.10.10).eml', 'forensic', '7cd20f40e9244c72324f94fcd826e0a2c96d69b1f0b8a1f1104d34ff8eb5cf3a', 2855),
('forensic/[Netease DMARC Failure Report] Rent Reminder.eml', 'forensic', '9406128687ca5e58630858b14cc880271c80b22a11823029ccc8067f60638aee', 2990),
('forensic/dmarc_ruf_report_linkedin.crlf.eml', 'forensic', '1b814b0ce789762c2fee2a0b5b69b43ab9f65a1ba46186b43f38ec14ff5302ce', 7871),
('forensic/dmarc_ruf_report_linkedin.eml', 'forensic', 'a150df9435fe61a4b8fb9dea6519a0b4514488b2a1e422db38a9c3c1be1c4563', 7645),
('smtp_tls/google.com_smtp_tls_report.eml', 'forensic', '168ca94e18837ca4841f5853e2920288c68f1bfdafdcaf4169aea920beed7172', 2605),
('smtp_tls/mail.ru.json', 'smtp_tls', '1ff8d95f5eeff381c989a0ed7dc08accb5a6d630dc50f2a56e2997e73a28ddde', 772),
('smtp_tls/rfc8460.json', 'smtp_tls', 'ddca6a44db749f3a10d26e1b3ffbf93117ee05558882723814950c5151c5c8d7', 1420),
('smtp_tls/smtp_tls.json', 'smtp_tls', '27ada5047ed09d1543a1dd2da8ea450a6107f461f33fad9b3c6a016e79cd2542', 1051))
SELECT CAST(file AS VARCHAR) AS file, CAST(family AS VARCHAR) AS family, CAST(doc_sha256 AS VARCHAR) AS doc_sha256, CAST(doc_chars AS INTEGER) AS doc_chars FROM t ORDER BY file
