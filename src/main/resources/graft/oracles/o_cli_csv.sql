-- Committed expected CLI output documents over the reference sample
-- corpus (30 files): sha256 of the byte-faithful ReportJson
-- serialization per file. SF-independent; regenerate from a Verify run
-- after a deliberate parser/serializer change and review the diff.
WITH t(file, family, doc_sha256, doc_chars) AS (VALUES
('aggregate/!example.com!1538204542!1538463818.xml', 'aggregate', 'bf06689c80abd7b15a02786be7d1b00a42487cc1aabaed64368e260a9840cbd1', 468),
('aggregate/!large-example.com!1711897200!1711983600.xml', 'aggregate', '1e70ec07a45ce9ad14a07e9552d6a52004c2cb1618b625bf257ec1d907755995', 445071),
('aggregate/Report domain- borschow.com Submitter- google.com Report-ID- 949348866075514174.eml', 'aggregate', 'e332c1d937a955b292c6fee622901d3a7effacd3ecc9657f7181a34f1ca5a6b9', 490),
('aggregate/addisonfoods.com!example.com!1536105600!1536191999.xml', 'aggregate', '39886fb99a4eb3ecfbe75f1803547963642877a91c985a5bc6ca8da73da2ac97', 526),
('aggregate/empty_reason.xml', 'aggregate', 'e55bd525de22994096e056ba5bd4624fb43a8973f62875c9806ef853b34de68c', 526),
('aggregate/estadocuenta1.infonacot.gob.mx!example.com!1536853302!1536939702!2940.xml.zip', 'aggregate', 'dbba7bba29ed29949729c7fbc9437e503eb8ba024354ea74d5aa3a5b01c769ae', 467),
('aggregate/example.net!example.com!1529366400!1529452799.xml', 'aggregate', '84924b7689946fe0d7f8472e009828c854d648ad896878138105d4a598299264', 487),
('aggregate/fastmail.com!example.com!1516060800!1516147199!102675056.xml.gz', 'aggregate', '590929158fe18f9a2bb01f196b5c1be03072a5b5d010d6767e71714e17116b6c', 482),
('aggregate/ikea.com!example.de!1538690400!1538776800.xml', 'aggregate', 'cd3f9dde4cd7a86ef7e531cc5b9047851b1f8e45802783c4f2c8c1c9a1948f37', 513),
('aggregate/invalid_utf_8.xml', 'aggregate', '3d4c9b73372a26b0ac6b24d4d86a4cfd8e7b73b49c6880f64af9a6395819705d', 466),
('aggregate/invalid_xml.xml', 'error', '', 0),
('aggregate/mimecast-weird-gzip.eml', 'aggregate', '910b1892366ed300883e06208469adfe53c95c79beb9d2017255d1e6929092f1', 533),
('aggregate/old_draft_from_wiki.xml', 'aggregate', '932e1ddf6322d7ce2b79ac4dd01b47b534c9878c75c889aeb64b127a112227cc', 492),
('aggregate/protection.outlook.com!example.com!1711756800!1711843200.xml', 'aggregate', 'e002b65a16ad1ccafb3594999001db2908d6b17fda35367014dc522730600c4a', 501),
('aggregate/twilight.eml', 'aggregate', '0cbf69123a44f0d9ded37adeed3bf666ee452f2aad645a4f82e2db97267d549f', 498),
('aggregate/usssa.com!example.com!1538784000!1538870399.xml', 'aggregate', '2fa4bf2a1ddab992582961896b3445ac617e46963e4431f8e53262c949446e16', 669),
('aggregate/veeam.com!example.com!1530133200!1530219600.xml', 'aggregate', '9b33f7c76996d5201b416d7eae93347d7a93d08351b4769fe0b961df0e9016cf', 474),
('aggregate_invalid/report_with_upper_cased_pass.xml', 'error', '', 0),
('extract_report/changed-input.xml', 'aggregate', '3452b7aea8f29e593cf274579cec767c8f339399db02a3509617531285c1f015', 5164),
('extract_report/nice-input.xml', 'aggregate', '20bdeffb85696d37ee49da1e3e68405ef13da7f61b29cbf9e624881d997b4d46', 5204),
('extract_report/nice-input.xml.gz', 'aggregate', '20bdeffb85696d37ee49da1e3e68405ef13da7f61b29cbf9e624881d997b4d46', 5204),
('extract_report/nice-input.xml.zip', 'aggregate', '20bdeffb85696d37ee49da1e3e68405ef13da7f61b29cbf9e624881d997b4d46', 5204),
('forensic/DMARC Failure Report for domain.de (mail-from=sharepoint@domain.de, ip=10.10.10.10).eml', 'forensic', '065519e362e6733deba7aa4c22bbf9dba5fd338dd7c7af3bbf24e7eccd893abc', 553),
('forensic/[Netease DMARC Failure Report] Rent Reminder.eml', 'forensic', '9188341c518e032896b19993115fefd20d77faa324bc16700a328c6b1d1f3f5b', 681),
('forensic/dmarc_ruf_report_linkedin.crlf.eml', 'forensic', '3bd6120a0befb06faab5763a3184671024087c05e3dc887f308a89bc855c0d40', 1005),
('forensic/dmarc_ruf_report_linkedin.eml', 'forensic', '3bd6120a0befb06faab5763a3184671024087c05e3dc887f308a89bc855c0d40', 1005),
('smtp_tls/google.com_smtp_tls_report.eml', 'forensic', '43ee700b5ae9bd9eca76ed394a5097b74c469c8ab7d0f66bf90d95827e4d3feb', 453),
('smtp_tls/mail.ru.json', 'smtp_tls', 'ef895a4a51e47aeec6be83616fa3edd034a08a2a251200498ada5a163f63426d', 527),
('smtp_tls/rfc8460.json', 'smtp_tls', '85d206eb2677ebe830d2f3770f7bd652b37b68cb68d4e17d69a0e30cf242fdc1', 800),
('smtp_tls/smtp_tls.json', 'smtp_tls', '3a67697aa37d03593f1dd70c9aa25ec93b2b96459ed30da16057dbf2222f438f', 573))
SELECT CAST(file AS VARCHAR) AS file, CAST(family AS VARCHAR) AS family, CAST(doc_sha256 AS VARCHAR) AS doc_sha256, CAST(doc_chars AS INTEGER) AS doc_chars FROM t ORDER BY file
