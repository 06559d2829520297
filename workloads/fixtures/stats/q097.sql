SELECT COUNT(*) FROM posts as p, postLinks as pl WHERE pl.PostId = p.Id AND p.ViewCount>=1132 AND p.AnswerCount>=2 AND pl.LinkTypeId<=3 AND pl.CreationDate<='2012-11-04 05:18:07'::timestamp;
