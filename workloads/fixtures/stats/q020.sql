SELECT COUNT(*) FROM posts as p, comments as c WHERE c.PostId = p.Id AND p.PostTypeId>=3 AND p.ViewCount<=5848 AND c.Score=0;
