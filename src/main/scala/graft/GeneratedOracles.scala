package graft

/** DuckDB VALUES oracles generated from the deterministic golden-corpus
  * exports by [[DumpOracles]] (regenerate with `sbt "runMain graft.DumpOracles"`
  * after any intentional behavior change). The golden corpus is hand-traced
  * and pinned exactly by GoldenSpec, so these derived-export pins are real
  * regression oracles: any drift in emitter or pipeline behavior flips the
  * driver's CORRECTNESS row red.
  */
object GeneratedOracles {
  val arizona: String =
"""SELECT * FROM (VALUES
('Deubiquitination(uniprot:Q13625)', 'Deubiquitination(uniprot:Q13625)', 'uniprot:Q96CV9', 'Positive_regulation', '', FALSE, FALSE, FALSE, '', '', '', '', '', 'promoted', 1, 'deubiquitination of ASPP2 is promoted by optineurin', 'g02', 8567666036770852415),
('Phosphorylation(uniprot:P28482)', 'Phosphorylation(uniprot:P28482)', 'uniprot:Q02750', 'Positive_regulation', '', FALSE, FALSE, FALSE, '', '', '', '', '', 'phosphorylated|phosphorylates', 2, 'ERK2 , which is phosphorylated by MEK1 | MEK1 , a dual-specificity kinase , phosphorylates ERK2', 'g21|g25', 5867856372638347762),
('Phosphorylation(uniprot:P28482)', 'Phosphorylation(uniprot:P28482)', 'uniprot:Q02750', 'Positive_regulation', '', FALSE, FALSE, TRUE, '', '', '', '', '', 'phosphorylates', 1, 'MEK1 phosphorylates ERK2', 'g07', 6079227973331129794),
('Phosphorylation(uniprot:P28482)', 'Phosphorylation(uniprot:P28482)', 'uniprot:Q02750', 'Positive_regulation', '', TRUE, FALSE, FALSE, '', '', '', '', '', 'phosphorylate', 1, 'MEK does not phosphorylate ERK2', 'g05', 6444561402133448896),
('Phosphorylation(uniprot:P28482@T669)', 'Phosphorylation(uniprot:P28482@T669)', 'uniprot:Q02750', 'Positive_regulation', 'T669', FALSE, FALSE, FALSE, '', '', '', '', '', 'phosphorylates', 2, 'MEK1 phosphorylates ERK2 at T669', 'g16|g20', 9140622222992566604),
('Phosphorylation(uniprot:P31749)', 'Phosphorylation(uniprot:P31749)', 'pfam:PF00071', 'Positive_regulation', '', FALSE, FALSE, FALSE, '', '', '', '', '', 'phosphorylates', 1, 'Ras protein phosphorylates AKT1', 'g03', 4702379385362910069),
('Phosphorylation(uniprot:P31749)', 'Phosphorylation(uniprot:P31749)', 'uniprot:P28482', 'Negative_regulation', '', FALSE, FALSE, FALSE, '', '', '', '', '', 'increases', 1, 'Decreased ERK2 expression increases phosphorylation of AKT1', 'g17', 7304270418553893356),
('Phosphorylation(uniprot:P31749)', 'Phosphorylation(uniprot:P31749)', 'uniprot:P60484', 'Negative_regulation', '', FALSE, FALSE, FALSE, '', '', '', '', '', 'promotes', 1, 'Loss of PTEN promotes phosphorylation of AKT1', 'g11', 3515525177645407262),
('Phosphorylation(uniprot:P31749)', 'Phosphorylation(uniprot:P31749)', 'uniprot:Q02750', 'Positive_regulation', '', FALSE, FALSE, FALSE, '', '', 'cellosaurus:CVCL_0030', '', '', 'phosphorylated', 1, 'It is phosphorylated by MEK', 'g08', 8513548491326250240),
('Phosphorylation(uniprot:P31749)', 'Phosphorylation(uniprot:P31749)', 'uniprot:Q96CV9', 'Positive_regulation', '', FALSE, FALSE, FALSE, '', '', '', '', '', 'phosphorylates', 1, 'OLK1 phosphorylates AKT1', 'g23', 3816795224345975258),
('Phosphorylation(uniprot:Q15717)', 'Phosphorylation(uniprot:Q15717)', 'uniprot:P52333', 'Positive_regulation', '', FALSE, FALSE, FALSE, '', '', '', '', '', 'phosphorylates', 1, 'JAK3 phosphorylates HuR', 'g20', 3160803012831156418),
('Phosphorylation(uniprot:Q15717@Y200)', 'Phosphorylation(uniprot:Q15717@Y200)', 'uniprot:P52333', 'Positive_regulation', 'Y200', FALSE, FALSE, FALSE, '', '', '', '', '', 'phosphorylates', 1, 'JAK3 phosphorylates three HuR residues ( Y63 , Y68 , Y200', 'g01', 7907786514298896383),
('Phosphorylation(uniprot:Q15717@Y63)', 'Phosphorylation(uniprot:Q15717@Y63)', 'uniprot:P52333', 'Positive_regulation', 'Y63', FALSE, FALSE, FALSE, '', '', '', '', '', 'increased|phosphorylates', 2, 'JAK3 phosphorylates three HuR residues ( Y63 | phosphorylation of the Y63 residue of HuR is increased by JAK3', 'g01|g22', 5555907675543566827),
('Phosphorylation(uniprot:Q15717@Y68)', 'Phosphorylation(uniprot:Q15717@Y68)', 'uniprot:P52333', 'Positive_regulation', 'Y68', FALSE, FALSE, FALSE, '', '', '', '', '', 'phosphorylates', 1, 'JAK3 phosphorylates three HuR residues ( Y63 , Y68', 'g01', 4167656160292749069),
('Phosphorylation(uniprot:Q96CV9)', 'Phosphorylation(uniprot:Q96CV9)', 'uniprot:P23458', 'Positive_regulation', '', FALSE, FALSE, FALSE, '', '', '', '', '', 'phosphorylated', 1, 'OPTN is phosphorylated by JAK1', 'g09', 5156202489102546683),
('Transcription(uniprot:P24385)', 'Transcription(uniprot:P24385)', 'uniprot:P35222', 'Positive_regulation', '', FALSE, FALSE, FALSE, '', '', '', '', '', 'induced', 1, 'transcription of cyclin D1 is induced by beta-catenin', 'g14', 8320554036585476087),
('uniprot:P24385', 'uniprot:P24385', '', 'Transcription', '', FALSE, FALSE, FALSE, '', '', '', '', '', 'transcription', 1, 'transcription of cyclin D1', 'g14', 598037774659938961),
('uniprot:P28482&uniprot:P31749', 'uniprot:P28482&uniprot:P31749', '', 'Binding', '', FALSE, FALSE, FALSE, '', '', '', '', '', 'binds', 1, 'ERK2 T669A mutant binds AKT1', 'g26', 4823474788919404845),
('uniprot:P28482&uniprot:P40763', 'uniprot:P28482&uniprot:P40763', '', 'Binding', '', FALSE, FALSE, FALSE, '', '', '', '', '', 'binds', 1, 'ERK2 binds STAT3', 'g27', 5198258463875669423),
('uniprot:P28482', 'uniprot:P28482', '', 'DecreaseAmount', '', FALSE, FALSE, FALSE, '', '', '', '', '', 'Decreased', 1, 'Decreased ERK2', 'g17', 1970954666974980391),
('uniprot:P28482', 'uniprot:P28482.p', '', 'Phosphorylation', '', FALSE, FALSE, FALSE, '', '', '', '', '', 'phosphorylated|phosphorylates', 3, 'ERK2 , which is phosphorylated | ERK2 is not phosphorylated | phosphorylates ERK2', 'g06|g21|g25', 6055505567784593959),
('uniprot:P28482', 'uniprot:P28482.p', '', 'Phosphorylation', '', FALSE, FALSE, TRUE, '', '', '', '', '', 'phosphorylates', 1, 'phosphorylates ERK2', 'g07', 8033047762504547822),
('uniprot:P28482', 'uniprot:P28482.p', '', 'Phosphorylation', '', TRUE, FALSE, FALSE, '', '', '', '', '', 'phosphorylate', 1, 'phosphorylate ERK2', 'g05', 7507112014671519552),
('uniprot:P28482', 'uniprot:P28482.p@T669', '', 'Phosphorylation', 'T669', FALSE, FALSE, FALSE, '', '', '', '', '', 'phosphorylates', 2, 'phosphorylates ERK2 at T669', 'g16|g20', 1142565862990137867),
('uniprot:P31749&uniprot:P49840', 'uniprot:P31749&uniprot:P49840', '', 'Binding', '', FALSE, FALSE, FALSE, '', '', '', '', '', 'binds', 1, 'AKT1 binds GSK3', 'g04', 4719816809103021068),
('uniprot:P31749&uniprot:Q92934', 'uniprot:P31749&uniprot:Q92934', '', 'Binding', '', FALSE, FALSE, FALSE, '', '', '', '', '', 'binds', 1, 'AKT1 binds GSK3 and BAD', 'g04', 7626940420605938798),
('uniprot:P31749', 'uniprot:P31749.p', '', 'Phosphorylation', '', FALSE, FALSE, FALSE, '', '', 'cellosaurus:CVCL_0030', '', '', 'phosphorylated|phosphorylates|phosphorylation', 5, 'It is phosphorylated | phosphorylates AKT1 | phosphorylation of AKT1', 'g03|g08|g11|g17|g23', 3885625275123233314),
('uniprot:P40763', 'uniprot:P40763', '', 'Translocation', 'go:GO:0005634', FALSE, FALSE, FALSE, '', '', '', '', 'go:GO:0005634', 'translocates', 1, 'STAT3 translocates to the nucleus', 'g13', 1738708647517689008),
('uniprot:P40763', 'uniprot:P40763.a', 'uniprot:P23458', 'Positive_activation', '', FALSE, TRUE, FALSE, '', '', '', '', '', 'activated', 1, 'STAT3 is activated by JAK1', 'g18', 4817371779024621090),
('uniprot:P40763', 'uniprot:P40763.a', 'uniprot:P28482', 'Positive_activation', '', FALSE, TRUE, FALSE, '', '', '', '', '', 'activates', 1, 'ERK2 , which is phosphorylated by MEK1 , activates STAT3', 'g21', 1785859428814081983),
('uniprot:P42345', 'uniprot:P42345', '', 'DecreaseAmount', '', FALSE, FALSE, FALSE, '', '', '', '', '', 'decreases', 1, 'decreases mTOR', 'g15', 6046414754283322351),
('uniprot:P42345', 'uniprot:P42345', 'pubchem:CID5284616', 'Negative_activation', '', FALSE, TRUE, FALSE, '', '', '', '', '', 'inhibits', 1, 'Rapamycin inhibits mTOR', 'g12', 7878985710276469465),
('uniprot:P60484', 'uniprot:P60484', '', 'DecreaseAmount', '', FALSE, FALSE, FALSE, '', '', '', '', '', 'Loss', 1, 'Loss of PTEN', 'g11', 3519089696793124023),
('uniprot:P62993&uniprot:Q07889', 'uniprot:P62993&uniprot:Q07889', '', 'Binding', '', FALSE, FALSE, TRUE, '', '', '', '', '', 'interaction', 1, 'interaction of Grb2 with SOS', 'g19', 8315667006604522726),
('uniprot:P63085', 'uniprot:P63085.p@T669', '', 'Phosphorylation', 'T669', FALSE, FALSE, FALSE, 'taxonomy:10090', '', '', '', '', 'phosphorylated', 1, 'ERK2 was phosphorylated at T669', 'g10', 446952576071700950),
('uniprot:Q13625', 'uniprot:Q13625.d', '', 'Deubiquitination', '', FALSE, FALSE, FALSE, '', '', '', '', '', 'deubiquitination', 1, 'deubiquitination of ASPP2', 'g02', 1775365355160841919),
('uniprot:Q15717', 'uniprot:Q15717.p', '', 'Phosphorylation', '', FALSE, FALSE, FALSE, '', '', '', '', '', 'phosphorylates', 1, 'phosphorylates HuR', 'g20', 3072062941962944427),
('uniprot:Q15717', 'uniprot:Q15717.p@Y200', '', 'Phosphorylation', 'Y200', FALSE, FALSE, FALSE, '', '', '', '', '', 'phosphorylates', 1, 'phosphorylates three HuR residues ( Y63 , Y68 , Y200', 'g01', 8727624980037009698),
('uniprot:Q15717', 'uniprot:Q15717.p@Y63', '', 'Phosphorylation', 'Y63', FALSE, FALSE, FALSE, '', '', '', '', '', 'phosphorylates|phosphorylation', 2, 'phosphorylates three HuR residues ( Y63 | phosphorylation of the Y63 residue of HuR', 'g01|g22', 5849277317546161290),
('uniprot:Q15717', 'uniprot:Q15717.p@Y68', '', 'Phosphorylation', 'Y68', FALSE, FALSE, FALSE, '', '', '', '', '', 'phosphorylates', 1, 'phosphorylates three HuR residues ( Y63 , Y68', 'g01', 7341657907881215395),
('uniprot:Q96CV9', 'uniprot:Q96CV9.p', '', 'Phosphorylation', '', FALSE, FALSE, FALSE, '', '', '', '', '', 'phosphorylated', 1, 'OPTN is phosphorylated', 'g09', 2745685265836048184)
) AS t(INPUT, OUTPUT, CONTROLLER, EVENT_LABEL, SITE, NEGATED, INDIRECT, HYPOTHESIS, CONTEXT_SPECIES, CONTEXT_ORGAN, CONTEXT_CELL_LINE, CONTEXT_CELL_TYPE, TRANSLOCATION_DESTINATION, TRIGGERS, SEEN, EVIDENCE, SEEN_IN, EVENT_ID)"""

  val canonicalNodes: String =
"""SELECT * FROM (VALUES
('cellosaurus:CVCL_0030', 'HeLa', 'CellLine', 1),
('go:GO:0005634', 'nucleus', 'Cellular_component', 1),
('go:GO:0006914', 'autophagy', 'BioProcess', 1),
('pfam:PF00071', 'Ras', 'Family', 1),
('pubchem:CID5284616', 'Rapamycin', 'Simple_chemical', 1),
('taxonomy:10090', 'mouse', 'Species', 1),
('uaz:UAZ:d1', 'D1', 'Site', 1),
('uaz:UAZ:t669', 'T669', 'Site', 1),
('uaz:UAZ:y200', 'Y200', 'Site', 1),
('uaz:UAZ:y63', 'Y63', 'Site', 1),
('uaz:UAZ:y68', 'Y68', 'Site', 1),
('uniprot:P23458', 'JAK1', 'Gene_or_gene_product', 1),
('uniprot:P24385', 'cyclin D1', 'Gene_or_gene_product', 1),
('uniprot:P28482', 'ERK2', 'Gene_or_gene_product', 1),
('uniprot:P31749', 'AKT1', 'Gene_or_gene_product', 1),
('uniprot:P35222', 'beta-catenin', 'Gene_or_gene_product', 1),
('uniprot:P40763', 'STAT3', 'Gene_or_gene_product', 1),
('uniprot:P42345', 'mTOR', 'Gene_or_gene_product', 1),
('uniprot:P49840', 'GSK3', 'Gene_or_gene_product', 1),
('uniprot:P52333', 'JAK3', 'Gene_or_gene_product', 1),
('uniprot:P60484', 'PTEN', 'Gene_or_gene_product', 1),
('uniprot:P62993', 'Grb2', 'Gene_or_gene_product', 1),
('uniprot:P63085', 'ERK2', 'Gene_or_gene_product', 1),
('uniprot:Q02750', 'MEK1', 'Gene_or_gene_product', 2),
('uniprot:Q07889', 'SOS', 'Gene_or_gene_product', 1),
('uniprot:Q13625', 'ASPP2', 'Gene_or_gene_product', 1),
('uniprot:Q15717', 'HuR', 'Gene_or_gene_product', 1),
('uniprot:Q92934', 'BAD', 'Gene_or_gene_product', 1),
('uniprot:Q96CV9', 'OLK1', 'Gene_or_gene_product', 4)
) AS t(canon_id, display, label, n_aliases)"""

  val fries: String =
"""SELECT * FROM (VALUES
('{"frame_id":-1295195579155152918,"frame_type":"event-mention","type":"Positive_regulation","controller":{"canon_id":"uniprot:Q96CV9"},"argument":{"canon_id":"Phosphorylation(uniprot:P31749)","site":""},"is_negated":false,"is_hypothesis":false,"provenance":{"conv_id":"g23","turn_idx":0,"text":"OLK1 phosphorylates AKT1"},"found_by":"mod_active_split"}'),
('{"frame_id":-1741171951126775926,"frame_type":"event-mention","type":"Phosphorylation","controller":{"canon_id":""},"argument":{"canon_id":"uniprot:P63085","site":"T669"},"is_negated":false,"is_hypothesis":false,"provenance":{"conv_id":"g10","turn_idx":1,"text":"ERK2 was phosphorylated at T669"},"found_by":"mod_passive"}'),
('{"frame_id":-1896726334114449774,"frame_type":"event-mention","type":"Phosphorylation","controller":{"canon_id":""},"argument":{"canon_id":"uniprot:P31749","site":""},"is_negated":false,"is_hypothesis":false,"provenance":{"conv_id":"g11","turn_idx":0,"text":"phosphorylation of AKT1"},"found_by":"mod_nominal"}'),
('{"frame_id":-2226476596902381331,"frame_type":"event-mention","type":"Positive_regulation","controller":{"canon_id":"uniprot:Q02750"},"argument":{"canon_id":"Phosphorylation(uniprot:P28482)","site":""},"is_negated":false,"is_hypothesis":false,"provenance":{"conv_id":"g25","turn_idx":0,"text":"MEK1 , a dual-specificity kinase , phosphorylates ERK2"},"found_by":"mod_active_split"}'),
('{"frame_id":-2585579798427173036,"frame_type":"event-mention","type":"Positive_regulation","controller":{"canon_id":"uniprot:P52333"},"argument":{"canon_id":"Phosphorylation(uniprot:Q15717)","site":""},"is_negated":false,"is_hypothesis":false,"provenance":{"conv_id":"g20","turn_idx":0,"text":"JAK3 phosphorylates HuR"},"found_by":"mod_active_split"}'),
('{"frame_id":-2810241052941927536,"frame_type":"event-mention","type":"Phosphorylation","controller":{"canon_id":""},"argument":{"canon_id":"uniprot:P31749","site":""},"is_negated":false,"is_hypothesis":false,"provenance":{"conv_id":"g23","turn_idx":0,"text":"phosphorylates AKT1"},"found_by":"mod_active"}'),
('{"frame_id":-2903945142478777007,"frame_type":"event-mention","type":"Positive_activation","controller":{"canon_id":"uniprot:P28482"},"argument":{"canon_id":"uniprot:P40763","site":""},"is_negated":false,"is_hypothesis":false,"provenance":{"conv_id":"g21","turn_idx":0,"text":"ERK2 , which is phosphorylated by MEK1 , activates STAT3"},"found_by":"act_active"}'),
('{"frame_id":-370378082559712719,"frame_type":"event-mention","type":"Positive_regulation","controller":{"canon_id":"uniprot:Q02750"},"argument":{"canon_id":"Phosphorylation(uniprot:P31749)","site":""},"is_negated":false,"is_hypothesis":false,"provenance":{"conv_id":"g08","turn_idx":1,"text":"It is phosphorylated by MEK"},"found_by":"mod_passive_split"}'),
('{"frame_id":-3968378134396863957,"frame_type":"event-mention","type":"Positive_regulation","controller":{"canon_id":"uniprot:Q02750"},"argument":{"canon_id":"Phosphorylation(uniprot:P28482)","site":""},"is_negated":true,"is_hypothesis":false,"provenance":{"conv_id":"g05","turn_idx":0,"text":"MEK does not phosphorylate ERK2"},"found_by":"mod_active_split"}'),
('{"frame_id":-4001251238704377759,"frame_type":"event-mention","type":"Phosphorylation","controller":{"canon_id":""},"argument":{"canon_id":"uniprot:Q96CV9","site":""},"is_negated":false,"is_hypothesis":false,"provenance":{"conv_id":"g09","turn_idx":1,"text":"OPTN is phosphorylated"},"found_by":"mod_passive"}'),
('{"frame_id":-4623810990497827762,"frame_type":"event-mention","type":"Transcription","controller":{"canon_id":""},"argument":{"canon_id":"uniprot:P24385","site":""},"is_negated":false,"is_hypothesis":false,"provenance":{"conv_id":"g14","turn_idx":0,"text":"transcription of cyclin D1"},"found_by":"transcription_nominal"}'),
('{"frame_id":-4918351244248178208,"frame_type":"event-mention","type":"Phosphorylation","controller":{"canon_id":""},"argument":{"canon_id":"uniprot:Q15717","site":""},"is_negated":false,"is_hypothesis":false,"provenance":{"conv_id":"g20","turn_idx":0,"text":"phosphorylates HuR"},"found_by":"mod_active"}'),
('{"frame_id":-4929988936207328672,"frame_type":"event-mention","type":"Deubiquitination","controller":{"canon_id":""},"argument":{"canon_id":"uniprot:Q13625","site":""},"is_negated":false,"is_hypothesis":false,"provenance":{"conv_id":"g02","turn_idx":0,"text":"deubiquitination of ASPP2"},"found_by":"mod_nominal"}'),
('{"frame_id":-4948554566653564930,"frame_type":"event-mention","type":"Phosphorylation","controller":{"canon_id":""},"argument":{"canon_id":"uniprot:P28482","site":"T669"},"is_negated":false,"is_hypothesis":false,"provenance":{"conv_id":"g20","turn_idx":0,"text":"phosphorylates ERK2 at T669"},"found_by":"mod_active"}'),
('{"frame_id":-5117044648064761738,"frame_type":"event-mention","type":"Phosphorylation","controller":{"canon_id":""},"argument":{"canon_id":"uniprot:P31749","site":""},"is_negated":false,"is_hypothesis":false,"provenance":{"conv_id":"g17","turn_idx":0,"text":"phosphorylation of AKT1"},"found_by":"mod_nominal"}'),
('{"frame_id":-5135868010492092485,"frame_type":"event-mention","type":"Positive_regulation","controller":{"canon_id":"uniprot:Q96CV9"},"argument":{"canon_id":"Deubiquitination(uniprot:Q13625)","site":""},"is_negated":false,"is_hypothesis":false,"provenance":{"conv_id":"g02","turn_idx":0,"text":"deubiquitination of ASPP2 is promoted by optineurin"},"found_by":"reg_passive"}'),
('{"frame_id":-5203293228125399989,"frame_type":"event-mention","type":"Translocation","controller":{"canon_id":""},"argument":{"canon_id":"uniprot:P40763","site":"go:GO:0005634"},"is_negated":false,"is_hypothesis":false,"provenance":{"conv_id":"g13","turn_idx":0,"text":"STAT3 translocates to the nucleus"},"found_by":"transloc_active"}'),
('{"frame_id":-5388708417942836858,"frame_type":"event-mention","type":"Negative_regulation","controller":{"canon_id":"uniprot:P28482"},"argument":{"canon_id":"Phosphorylation(uniprot:P31749)","site":""},"is_negated":false,"is_hypothesis":false,"provenance":{"conv_id":"g17","turn_idx":0,"text":"Decreased ERK2 expression increases phosphorylation of AKT1"},"found_by":"reg_active"}'),
('{"frame_id":-539341930682264785,"frame_type":"event-mention","type":"Positive_regulation","controller":{"canon_id":"uniprot:P52333"},"argument":{"canon_id":"Phosphorylation(uniprot:Q15717@Y63)","site":"Y63"},"is_negated":false,"is_hypothesis":false,"provenance":{"conv_id":"g01","turn_idx":0,"text":"JAK3 phosphorylates three HuR residues ( Y63"},"found_by":"mod_active_split"}'),
('{"frame_id":-606919865651103537,"frame_type":"event-mention","type":"Negative_activation","controller":{"canon_id":"pubchem:CID5284616"},"argument":{"canon_id":"uniprot:P42345","site":""},"is_negated":false,"is_hypothesis":false,"provenance":{"conv_id":"g12","turn_idx":0,"text":"Rapamycin inhibits mTOR"},"found_by":"act_active"}'),
('{"frame_id":-6189840594361590031,"frame_type":"event-mention","type":"Positive_regulation","controller":{"canon_id":"uniprot:Q02750"},"argument":{"canon_id":"Phosphorylation(uniprot:P28482@T669)","site":"T669"},"is_negated":false,"is_hypothesis":false,"provenance":{"conv_id":"g20","turn_idx":0,"text":"MEK1 phosphorylates ERK2 at T669"},"found_by":"mod_active_split"}'),
('{"frame_id":-6417107070966098969,"frame_type":"event-mention","type":"Phosphorylation","controller":{"canon_id":""},"argument":{"canon_id":"uniprot:P28482","site":""},"is_negated":false,"is_hypothesis":true,"provenance":{"conv_id":"g07","turn_idx":0,"text":"phosphorylates ERK2"},"found_by":"mod_active"}'),
('{"frame_id":-6735306064454334920,"frame_type":"event-mention","type":"Phosphorylation","controller":{"canon_id":""},"argument":{"canon_id":"uniprot:Q15717","site":"Y63"},"is_negated":false,"is_hypothesis":false,"provenance":{"conv_id":"g22","turn_idx":0,"text":"phosphorylation of the Y63 residue of HuR"},"found_by":"mod_nominal"}'),
('{"frame_id":-7505256810150472660,"frame_type":"event-mention","type":"Phosphorylation","controller":{"canon_id":""},"argument":{"canon_id":"uniprot:P28482","site":""},"is_negated":false,"is_hypothesis":false,"provenance":{"conv_id":"g06","turn_idx":0,"text":"ERK2 is not phosphorylated"},"found_by":"mod_passive"}'),
('{"frame_id":-7588794284432649017,"frame_type":"event-mention","type":"Positive_regulation","controller":{"canon_id":"uniprot:Q02750"},"argument":{"canon_id":"Phosphorylation(uniprot:P28482@T669)","site":"T669"},"is_negated":false,"is_hypothesis":false,"provenance":{"conv_id":"g16","turn_idx":0,"text":"MEK1 phosphorylates ERK2 at T669"},"found_by":"mod_active_split"}'),
('{"frame_id":-7760714446403090263,"frame_type":"event-mention","type":"Binding","controller":{"canon_id":""},"argument":{"canon_id":"uniprot:P31749&uniprot:P49840","site":""},"is_negated":false,"is_hypothesis":false,"provenance":{"conv_id":"g04","turn_idx":0,"text":"AKT1 binds GSK3"},"found_by":"bind_active"}'),
('{"frame_id":-7816328696916569593,"frame_type":"event-mention","type":"Positive_regulation","controller":{"canon_id":"uniprot:P52333"},"argument":{"canon_id":"Phosphorylation(uniprot:Q15717@Y200)","site":"Y200"},"is_negated":false,"is_hypothesis":false,"provenance":{"conv_id":"g01","turn_idx":0,"text":"JAK3 phosphorylates three HuR residues ( Y63 , Y68 , Y200"},"found_by":"mod_active_split"}'),
('{"frame_id":-8014439159417368,"frame_type":"event-mention","type":"Phosphorylation","controller":{"canon_id":""},"argument":{"canon_id":"uniprot:Q15717","site":"Y68"},"is_negated":false,"is_hypothesis":false,"provenance":{"conv_id":"g01","turn_idx":0,"text":"phosphorylates three HuR residues ( Y63 , Y68"},"found_by":"mod_active"}'),
('{"frame_id":-8462147461991749918,"frame_type":"event-mention","type":"Phosphorylation","controller":{"canon_id":""},"argument":{"canon_id":"uniprot:P28482","site":""},"is_negated":false,"is_hypothesis":false,"provenance":{"conv_id":"g25","turn_idx":0,"text":"phosphorylates ERK2"},"found_by":"mod_active"}'),
('{"frame_id":1547226842151558538,"frame_type":"event-mention","type":"Phosphorylation","controller":{"canon_id":""},"argument":{"canon_id":"uniprot:P31749","site":""},"is_negated":false,"is_hypothesis":false,"provenance":{"conv_id":"g08","turn_idx":1,"text":"It is phosphorylated"},"found_by":"mod_passive"}'),
('{"frame_id":2720047631386769339,"frame_type":"event-mention","type":"Phosphorylation","controller":{"canon_id":""},"argument":{"canon_id":"uniprot:Q15717","site":"Y200"},"is_negated":false,"is_hypothesis":false,"provenance":{"conv_id":"g01","turn_idx":0,"text":"phosphorylates three HuR residues ( Y63 , Y68 , Y200"},"found_by":"mod_active"}'),
('{"frame_id":282301757319803343,"frame_type":"event-mention","type":"DecreaseAmount","controller":{"canon_id":""},"argument":{"canon_id":"uniprot:P42345","site":""},"is_negated":false,"is_hypothesis":false,"provenance":{"conv_id":"g15","turn_idx":0,"text":"decreases mTOR"},"found_by":"amount_nominal"}'),
('{"frame_id":3005719349797825935,"frame_type":"event-mention","type":"Binding","controller":{"canon_id":""},"argument":{"canon_id":"uniprot:P28482&uniprot:P31749","site":""},"is_negated":false,"is_hypothesis":false,"provenance":{"conv_id":"g26","turn_idx":0,"text":"ERK2 T669A mutant binds AKT1"},"found_by":"bind_active"}'),
('{"frame_id":3229548893224750058,"frame_type":"event-mention","type":"DecreaseAmount","controller":{"canon_id":""},"argument":{"canon_id":"uniprot:P28482","site":""},"is_negated":false,"is_hypothesis":false,"provenance":{"conv_id":"g17","turn_idx":0,"text":"Decreased ERK2"},"found_by":"amount_nominal"}'),
('{"frame_id":3706113288560426776,"frame_type":"event-mention","type":"Positive_regulation","controller":{"canon_id":"uniprot:P35222"},"argument":{"canon_id":"Transcription(uniprot:P24385)","site":""},"is_negated":false,"is_hypothesis":false,"provenance":{"conv_id":"g14","turn_idx":0,"text":"transcription of cyclin D1 is induced by beta-catenin"},"found_by":"reg_passive"}'),
('{"frame_id":3863552284541884337,"frame_type":"event-mention","type":"Phosphorylation","controller":{"canon_id":""},"argument":{"canon_id":"uniprot:P28482","site":""},"is_negated":false,"is_hypothesis":false,"provenance":{"conv_id":"g21","turn_idx":0,"text":"ERK2 , which is phosphorylated"},"found_by":"mod_relcl"}'),
('{"frame_id":4811107883662184626,"frame_type":"event-mention","type":"Positive_regulation","controller":{"canon_id":"uniprot:Q02750"},"argument":{"canon_id":"Phosphorylation(uniprot:P28482)","site":""},"is_negated":false,"is_hypothesis":false,"provenance":{"conv_id":"g21","turn_idx":0,"text":"ERK2 , which is phosphorylated by MEK1"},"found_by":"mod_relcl_split"}'),
('{"frame_id":4900238336828302361,"frame_type":"event-mention","type":"Binding","controller":{"canon_id":""},"argument":{"canon_id":"uniprot:P62993&uniprot:Q07889","site":""},"is_negated":false,"is_hypothesis":true,"provenance":{"conv_id":"g19","turn_idx":0,"text":"interaction of Grb2 with SOS"},"found_by":"bind_nominal"}'),
('{"frame_id":4961043174891918012,"frame_type":"event-mention","type":"Positive_regulation","controller":{"canon_id":"pfam:PF00071"},"argument":{"canon_id":"Phosphorylation(uniprot:P31749)","site":""},"is_negated":false,"is_hypothesis":false,"provenance":{"conv_id":"g03","turn_idx":0,"text":"Ras protein phosphorylates AKT1"},"found_by":"mod_active_split"}'),
('{"frame_id":5216494331203325598,"frame_type":"event-mention","type":"Positive_regulation","controller":{"canon_id":"uniprot:P52333"},"argument":{"canon_id":"Phosphorylation(uniprot:Q15717@Y68)","site":"Y68"},"is_negated":false,"is_hypothesis":false,"provenance":{"conv_id":"g01","turn_idx":0,"text":"JAK3 phosphorylates three HuR residues ( Y63 , Y68"},"found_by":"mod_active_split"}'),
('{"frame_id":5253483363406780429,"frame_type":"event-mention","type":"Positive_regulation","controller":{"canon_id":"uniprot:P23458"},"argument":{"canon_id":"Phosphorylation(uniprot:Q96CV9)","site":""},"is_negated":false,"is_hypothesis":false,"provenance":{"conv_id":"g09","turn_idx":1,"text":"OPTN is phosphorylated by JAK1"},"found_by":"mod_passive_split"}'),
('{"frame_id":6009093468455008234,"frame_type":"event-mention","type":"Phosphorylation","controller":{"canon_id":""},"argument":{"canon_id":"uniprot:Q15717","site":"Y63"},"is_negated":false,"is_hypothesis":false,"provenance":{"conv_id":"g01","turn_idx":0,"text":"phosphorylates three HuR residues ( Y63"},"found_by":"mod_active"}'),
('{"frame_id":6360586911988480905,"frame_type":"event-mention","type":"Positive_regulation","controller":{"canon_id":"uniprot:Q02750"},"argument":{"canon_id":"Phosphorylation(uniprot:P28482)","site":""},"is_negated":false,"is_hypothesis":true,"provenance":{"conv_id":"g07","turn_idx":0,"text":"MEK1 phosphorylates ERK2"},"found_by":"mod_active_split"}'),
('{"frame_id":6708413661894094722,"frame_type":"event-mention","type":"Binding","controller":{"canon_id":""},"argument":{"canon_id":"uniprot:P28482&uniprot:P40763","site":""},"is_negated":false,"is_hypothesis":false,"provenance":{"conv_id":"g27","turn_idx":0,"text":"ERK2 binds STAT3"},"found_by":"bind_active"}'),
('{"frame_id":6721639376382795075,"frame_type":"event-mention","type":"Positive_activation","controller":{"canon_id":"uniprot:P23458"},"argument":{"canon_id":"uniprot:P40763","site":""},"is_negated":false,"is_hypothesis":false,"provenance":{"conv_id":"g18","turn_idx":0,"text":"STAT3 is activated by JAK1"},"found_by":"act_passive"}'),
('{"frame_id":6880386860964296204,"frame_type":"event-mention","type":"Phosphorylation","controller":{"canon_id":""},"argument":{"canon_id":"uniprot:P28482","site":"T669"},"is_negated":false,"is_hypothesis":false,"provenance":{"conv_id":"g16","turn_idx":0,"text":"phosphorylates ERK2 at T669"},"found_by":"mod_active"}'),
('{"frame_id":6921125952457723975,"frame_type":"event-mention","type":"Binding","controller":{"canon_id":""},"argument":{"canon_id":"uniprot:P31749&uniprot:Q92934","site":""},"is_negated":false,"is_hypothesis":false,"provenance":{"conv_id":"g04","turn_idx":0,"text":"AKT1 binds GSK3 and BAD"},"found_by":"bind_active"}'),
('{"frame_id":767724858274853041,"frame_type":"event-mention","type":"Positive_regulation","controller":{"canon_id":"uniprot:P52333"},"argument":{"canon_id":"Phosphorylation(uniprot:Q15717@Y63)","site":"Y63"},"is_negated":false,"is_hypothesis":false,"provenance":{"conv_id":"g22","turn_idx":0,"text":"phosphorylation of the Y63 residue of HuR is increased by JAK3"},"found_by":"reg_passive"}'),
('{"frame_id":7781349833436162735,"frame_type":"event-mention","type":"DecreaseAmount","controller":{"canon_id":""},"argument":{"canon_id":"uniprot:P60484","site":""},"is_negated":false,"is_hypothesis":false,"provenance":{"conv_id":"g11","turn_idx":0,"text":"Loss of PTEN"},"found_by":"amount_nominal"}'),
('{"frame_id":7793674121474783895,"frame_type":"event-mention","type":"Phosphorylation","controller":{"canon_id":""},"argument":{"canon_id":"uniprot:P31749","site":""},"is_negated":false,"is_hypothesis":false,"provenance":{"conv_id":"g03","turn_idx":0,"text":"phosphorylates AKT1"},"found_by":"mod_active"}'),
('{"frame_id":7834474291148114421,"frame_type":"event-mention","type":"Phosphorylation","controller":{"canon_id":""},"argument":{"canon_id":"uniprot:P28482","site":""},"is_negated":true,"is_hypothesis":false,"provenance":{"conv_id":"g05","turn_idx":0,"text":"phosphorylate ERK2"},"found_by":"mod_active"}'),
('{"frame_id":965296240292302728,"frame_type":"event-mention","type":"Negative_regulation","controller":{"canon_id":"uniprot:P60484"},"argument":{"canon_id":"Phosphorylation(uniprot:P31749)","site":""},"is_negated":false,"is_hypothesis":false,"provenance":{"conv_id":"g11","turn_idx":0,"text":"Loss of PTEN promotes phosphorylation of AKT1"},"found_by":"reg_active"}')
) AS t(frame)"""

  val simhash: String =
"""SELECT * FROM (VALUES
(1, 10, 0),
(1, 2, 7),
(2, 10, 7)
) AS t(a, b, hamming)"""

}